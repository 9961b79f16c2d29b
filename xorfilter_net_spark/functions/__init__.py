"""Python function surfaces beyond pandas UDFs: table functions (UDTF)."""

from .udtfs import register_token_spans_udtf, token_spans

__all__ = ["register_token_spans_udtf", "token_spans"]
