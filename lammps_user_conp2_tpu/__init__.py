"""TPU-native constant-potential molecular dynamics framework.

A from-scratch re-design of the capabilities of srtee/lammps-USER-CONP2
(constant-potential/charge/displacement electrodes for electrochemical MD)
for TPU hardware: JAX/XLA/Pallas compute, dense-linear-algebra Ewald,
jit-compiled MD loop, pjit/shard_map multi-chip scaling.
"""

__version__ = "0.1.0"
