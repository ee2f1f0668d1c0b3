from .generator import generate_wal, WalSpec  # noqa: F401
