from hairci.data.manifest import Manifest, load_manifest
from hairci.data.loader import DataLoader, decode_image

try:  # optional production loader (grain)
    from hairci.data.grain_loader import GrainLoader  # noqa: F401
except ImportError:  # pragma: no cover
    GrainLoader = None
