from .resnet import ResNet18, BasicBlock
from .qnet import HabitatDQN, build_qnet, init_qnet, qnet_apply
from .inverse import InverseActionModel, init_inverse, predict_actions
from .alexnet_places import AlexNetPlaces365
from . import torch_convert

__all__ = [
    "ResNet18",
    "BasicBlock",
    "HabitatDQN",
    "build_qnet",
    "init_qnet",
    "qnet_apply",
    "InverseActionModel",
    "init_inverse",
    "predict_actions",
    "AlexNetPlaces365",
    "torch_convert",
]
