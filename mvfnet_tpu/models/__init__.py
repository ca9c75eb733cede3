from .builder import (BACKBONES, HEADS, RECOGNIZERS,
                      SEGMENTAL_CONSENSUSES, SPATIAL_TEMPORAL_MODULES,
                      build_backbone, build_head, build_recognizer)
from .backbones import (resnet, resnet_i3d, resnet_i3d_slowfast,  # noqa
                        resnet_x3d, mobilenet_v2, bninception,  # noqa
                        inception_v1_i3d, resnet_r3d)  # noqa: F401 (registry population)
from .heads import tsn_head, i3d_head  # noqa: F401
from .recognizers import recognizer2d, recognizer3d  # noqa: F401

__all__ = ['RECOGNIZERS', 'BACKBONES', 'HEADS', 'SPATIAL_TEMPORAL_MODULES',
           'SEGMENTAL_CONSENSUSES', 'build_backbone', 'build_head',
           'build_recognizer']
