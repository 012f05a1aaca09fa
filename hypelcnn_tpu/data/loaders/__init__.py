from hypelcnn_tpu.data.loaders.base import DataLoader, LoadingMode, SampleSet
from hypelcnn_tpu.data.loaders.grss2013 import GRSS2013DataLoader
from hypelcnn_tpu.data.loaders.synthetic import SyntheticDataLoader

try:  # loaders added as breadth grows
    from hypelcnn_tpu.data.loaders.grss2018 import GRSS2018DataLoader
    from hypelcnn_tpu.data.loaders.gulfport import GULFPORTDataLoader
    from hypelcnn_tpu.data.loaders.gulfport_alt import GULFPORTALTDataLoader
    from hypelcnn_tpu.data.loaders.avon import AVONDataLoader
except ImportError:  # pragma: no cover
    pass

__all__ = [
    "DataLoader",
    "LoadingMode",
    "SampleSet",
    "GRSS2013DataLoader",
    "SyntheticDataLoader",
]
