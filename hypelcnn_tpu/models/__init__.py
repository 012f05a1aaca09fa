from hypelcnn_tpu.models.base import ModelOutput, NNModel
from hypelcnn_tpu.models.cap import CAPModel
from hypelcnn_tpu.models.concnn import CONCNNModel
from hypelcnn_tpu.models.dualcnn import DUALCNNModel
from hypelcnn_tpu.models.hypelcnn import HYPELCNNModel

__all__ = [
    "ModelOutput",
    "NNModel",
    "CAPModel",
    "CONCNNModel",
    "DUALCNNModel",
    "HYPELCNNModel",
]
