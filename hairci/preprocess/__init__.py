from hairci.preprocess.face_toolkit import (
    hair_mask,
    process_face_image,
    process_folder_multiprocess,
)
from hairci.preprocess.data_split import split_folder
