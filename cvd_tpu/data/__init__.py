from cvd_tpu.data.validation import ValRealEstate10KPoseFolded
from cvd_tpu.data.realestate10k import RealEstate10KPoseFolded
from cvd_tpu.data.loader import DataLoader, shard_indices
