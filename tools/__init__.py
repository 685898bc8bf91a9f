"""Probe / maintenance scripts; a package so tests can import the
shared definitions (tests/test_scale_slope.py imports
scale_xl.effective_doubling — one normalization formula, never two)."""
