"""Flax model zoo: MIL heads (ABMIL/CLAM/MIL-fc), ViT encoders, HIPT, ResNet."""

from hipt_abmil_atec23_tpu.models.abmil import (
    MILOutput,
    AttnNet,
    AttnNetGated,
    CLAM_SB,
    CLAM_MB,
    MIL_fc,
    MIL_fc_mc,
    MIL_SIZE_DICT,
    build_mil_model,
)
