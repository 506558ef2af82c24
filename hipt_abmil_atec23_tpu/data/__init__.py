"""Data layer: label manifests, CV splits, feature-bag stores, prefetch."""

from hipt_abmil_atec23_tpu.data.manifest import SlideManifest
from hipt_abmil_atec23_tpu.data.splits import (
    generate_kfold_splits,
    save_split_csv,
    load_split_csv,
)
from hipt_abmil_atec23_tpu.data.bags import FeatureBagStore, BagBatch, BagDataset
