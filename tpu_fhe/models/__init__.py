"""Encrypted model zoo: DNN layer library + ResNet-20 (PPML applications)."""

from .dnn import DNN, TensorCT
from . import resnet20

__all__ = ["DNN", "TensorCT", "resnet20"]
