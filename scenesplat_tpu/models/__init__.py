from .builder import MODELS, build_model
from .structure import PointBatch
from . import ptv3  # noqa: F401 (registers PT-v3m1)
from . import ptv2  # noqa: F401 (registers PT-v2m1/m2)
from . import spunet  # noqa: F401 (registers SpUNet variants)
from . import mink_unet  # noqa: F401 (registers MinkUNet variants)
from . import ptv1  # noqa: F401 (registers PointTransformer Seg/Cls)
from . import point_group  # noqa: F401 (registers PG-v1m1)
from . import msc  # noqa: F401 (registers MSC-v1m1)
from . import ppt  # noqa: F401 (registers PPT-v1m1/v1m2)
from . import cac  # noqa: F401 (registers CAC-v1m1)
from . import oacnns  # noqa: F401 (registers OACNNs)
from . import spvcnn  # noqa: F401 (registers SPVCNN)
from . import octformer  # noqa: F401 (registers OctFormer-v1m1)
from . import stratified  # noqa: F401 (registers ST-v1m1/v1m2)
from . import default  # noqa: F401 (registers task heads)
from .losses.builder import LOSSES, build_criteria
from .losses import misc as _losses_misc  # noqa: F401
from .losses import contrastive as _losses_contrastive  # noqa: F401
from .losses import lovasz as _losses_lovasz  # noqa: F401
from . import ssl as _ssl  # noqa: F401 (registers SimDINOSSL)
