# Supervised semseg on ScanNet-200 3DGS: the 20-class config with the
# 200-class label set. Counterpart of reference configs/scannet/
# semseg-gs-scannet200-all-w-normal-fixed-xyz.py.
_base_ = ["semseg-gs-scannet-all-w-normal-fixed-xyz.py"]

model = dict(num_classes=200)
data = dict(
    num_classes=200,
    train=dict(type="ScanNet200GSDataset"),
    val=dict(type="ScanNet200GSDataset"),
    test=dict(type="ScanNet200GSDataset"),
)
test = dict(num_classes=200)
