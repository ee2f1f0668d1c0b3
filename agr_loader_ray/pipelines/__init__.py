from .engine import CdcEngine  # noqa: F401
from .export import read_lake, export_sorted  # noqa: F401
