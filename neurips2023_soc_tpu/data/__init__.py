from .collate import collate_batch, normalize_frames
from .synthetic import SyntheticRVOSDataset, iterate_batches
