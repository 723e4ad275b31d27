from hairci.data.manifest import Manifest, load_manifest
from hairci.data.loader import DataLoader, decode_image
