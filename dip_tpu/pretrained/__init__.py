from dip_tpu.pretrained.backbones import VGG, AlexNet, get_backbone, vgg_preprocess_caffe, pytorch_preprocess
from dip_tpu.pretrained.matcher import Matcher
from dip_tpu.pretrained.convert import load_torch_weights, convert_torch_state_dict

__all__ = [
    "VGG",
    "AlexNet",
    "get_backbone",
    "vgg_preprocess_caffe",
    "pytorch_preprocess",
    "Matcher",
    "load_torch_weights",
    "convert_torch_state_dict",
]
