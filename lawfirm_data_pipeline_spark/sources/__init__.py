"""Source/sink connectors: schema-pinned file formats + paged external
sources."""

from .files import read_table, write_table  # noqa: F401
from .paged import paged_source  # noqa: F401
