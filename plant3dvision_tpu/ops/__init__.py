"""TPU compute kernels (L2): pure jittable functions, no DB/task coupling.

Design stance (SURVEY.md §7): the reference's per-view OpenCL kernel launches
and CPU hot loops become fused, jitted, shardable XLA/Pallas programs. Each
module documents which reference component it replaces.
"""
