# SimDINO self-supervised pretraining on ScanNet++ 3DGS.
# Counterpart of reference configs/scannetpp/ssl-pretrain-scannetpp-all-base.py.
import os

_base_ = ["../scannet/ssl-pretrain-scannet-all-base.py",
          "../_base_/dataset/scannetpp.py"]

data_root = os.environ.get("SCANNETPP_GS_ROOT", "data/scannetpp_gs")

data = dict(train=dict(data_root=data_root))
