"""DuckDB-oracle SQL helper fragments shared by several thematic
query modules (round-8 split of advanced.py)."""


_DUCK_HASH_PCT_EVENTS = (
    "(((strpos('0123456789abcdef', md5(event_id::VARCHAR)[1]) - 1) * 4096"
    " + (strpos('0123456789abcdef', md5(event_id::VARCHAR)[2]) - 1) * 256"
    " + (strpos('0123456789abcdef', md5(event_id::VARCHAR)[3]) - 1) * 16"
    " + (strpos('0123456789abcdef', md5(event_id::VARCHAR)[4]) - 1)) % 100)"
)
