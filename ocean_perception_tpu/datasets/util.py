"""Dataset factory (reference: dataset/dataset_util.hpp GetDatasetByName)."""

from __future__ import annotations

from .base import DataProvider
from .euroc import EurocDataset
from .folder_stereo import AcfrDataset, CaddyDataset, HimbDataset

_DATASETS = {
    "euroc": EurocDataset,
    "farmsim": EurocDataset,   # FarmSim exports use the EuRoC layout
    "zed": EurocDataset,       # ZED recordings too
    "himb": HimbDataset,
    "caddy": CaddyDataset,
    "acfr": AcfrDataset,
}


def get_dataset_by_name(name: str, path: str) -> DataProvider:
    key = name.lower()
    if key not in _DATASETS:
        raise ValueError(f"unknown dataset '{name}'; options: {sorted(_DATASETS)}")
    return _DATASETS[key](path)
