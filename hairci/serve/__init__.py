from hairci.serve.demo import DemoPipeline, parsing_image, fill_holes_display
from hairci.serve.visualizer import DataManager, RetrievalAPI
