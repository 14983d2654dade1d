# Counterpart of reference configs/_base_/dataset/scannetpp.py: the
# ScanNet++ top-100 semantic class names as data.names (consumed by the
# evaluators' per-class logging, reference engines/hooks/evaluator.py:84).
# The reference inlines the 100-name list; here it loads from the packaged
# metadata table (verified identical in tests/test_metadata.py).
from scenesplat_tpu.data.metadata import class_labels

data = dict(names=class_labels("scannetpp_top100"))
