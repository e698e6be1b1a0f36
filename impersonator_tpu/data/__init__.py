"""Host-side input pipelines feeding the device mesh."""

from impersonator_tpu.data.datasets import (  # noqa: F401
    ImPerDataset,
    PlaceDataset,
    FashionPairDataset,
    ImPerPlaceDataset,
    ImPerFashionPlaceDataset,
    SyntheticPairDataset,
    dataset_by_name,
)
from impersonator_tpu.data.loader import DataLoader  # noqa: F401
