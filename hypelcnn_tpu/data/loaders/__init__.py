from hypelcnn_tpu.data.loaders.base import DataLoader, LoadingMode, SampleSet
from hypelcnn_tpu.data.loaders.grss2013 import GRSS2013DataLoader
from hypelcnn_tpu.data.loaders.synthetic import SyntheticDataLoader

# no try/except here: swallowing an ImportError would turn a real broken
# import into a confusing "Unknown loader" registry failure much later
from hypelcnn_tpu.data.loaders.avon import AVONDataLoader
from hypelcnn_tpu.data.loaders.grss2018 import GRSS2018DataLoader
from hypelcnn_tpu.data.loaders.gulfport import GULFPORTDataLoader
from hypelcnn_tpu.data.loaders.gulfport_alt import GULFPORTALTDataLoader

__all__ = [
    "DataLoader",
    "LoadingMode",
    "SampleSet",
    "GRSS2013DataLoader",
    "SyntheticDataLoader",
]
