from .compat import (  # noqa: F401
    ch_left_join,
    exact_money,
    greatest_watermark,
    safe_div,
)
