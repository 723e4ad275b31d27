from hairci.retrieval.index import GalleryIndex
from hairci.retrieval.encoders import HairEncoder, FaceEncoder, list_image_folder
from hairci.retrieval.sharded import ShardedGalleryIndex, sharded_gallery_search
