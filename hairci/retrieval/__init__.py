from hairci.retrieval.index import GalleryIndex
from hairci.retrieval.encoders import HairEncoder, FaceEncoder, list_image_folder
from hairci.retrieval.sharded import ShardedGalleryIndex, sharded_gallery_search
from hairci.retrieval.faiss_io import (
    load_faiss_flat,
    read_flat_index,
    save_faiss_flat,
    write_flat_index,
)
