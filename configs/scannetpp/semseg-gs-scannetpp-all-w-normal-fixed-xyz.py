# Supervised semseg on ScanNet++ v1 3DGS (top-100 benchmark classes).
# Counterpart of reference configs/scannetpp/
# semseg-gs-scannetpp-all-w-normal-fixed-xyz.py.
import os

_base_ = ["../scannet/semseg-gs-scannet-all-w-normal-fixed-xyz.py",
          "../_base_/dataset/scannetpp.py"]

data_root = os.environ.get("SCANNETPP_GS_ROOT", "data/scannetpp_gs")

batch_size = 12  # reference: 3/GPU x 4 GPUs

model = dict(num_classes=100)
data = dict(
    num_classes=100,
    train=dict(type="ScanNetPPGSDataset", data_root=data_root),
    val=dict(type="ScanNetPPGSDataset", data_root=data_root),
    test=dict(type="ScanNetPPGSDataset", data_root=data_root),
)
test = dict(num_classes=100)
