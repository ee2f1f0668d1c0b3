from .manifest import LakeManifest  # noqa: F401
from .schema_registry import SchemaRegistry  # noqa: F401
