from .readers import Testdata, read_table  # noqa: F401
