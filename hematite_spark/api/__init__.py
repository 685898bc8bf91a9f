from hematite_spark.api.server import HematiteServer, serve

__all__ = ["HematiteServer", "serve"]
