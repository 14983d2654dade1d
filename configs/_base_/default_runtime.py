# default runtime (counterpart of reference configs/_base_/default_runtime.py)
seed = 0
save_path = "exp/default"
weight = None  # path to checkpoint
resume = False
batch_size = 2
batch_size_val = 1
batch_size_test = 1
num_worker = 8
mix_prob = 0.0
clip_grad = None
epoch = 100  # total data epochs; data loop = epoch // eval_epoch
eval_epoch = 100  # eval & checkpoint cadence (reference _base_/default_runtime.py:12-13)

train = dict(type="DefaultTrainer")
hooks = [
    dict(type="CheckpointLoader"),
    dict(type="IterationTimer", warmup_iter=2),
    dict(type="InformationWriter"),
    dict(type="CheckpointSaver", save_freq=None),
]
