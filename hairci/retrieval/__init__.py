from hairci.retrieval.index import GalleryIndex
from hairci.retrieval.encoders import HairEncoder, FaceEncoder, list_image_folder
