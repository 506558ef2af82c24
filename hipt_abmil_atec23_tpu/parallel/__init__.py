"""Device-mesh parallelism: fold-parallel CV, data-parallel encoding,
instance-axis (sequence-parallel) bag sharding."""

from hipt_abmil_atec23_tpu.parallel.mesh import make_mesh, fold_sharding
