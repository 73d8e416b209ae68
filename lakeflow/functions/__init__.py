from lakeflow.functions.exact import cents, micros, lit_ts

__all__ = ["cents", "micros", "lit_ts"]
