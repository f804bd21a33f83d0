"""nice_slam_tpu — a TPU-native neural-implicit dense RGB-D SLAM engine.

A from-scratch JAX/XLA/Pallas re-design of the NICE-SLAM pipeline
(reference: /root/reference, LongruiDong/nice-slam):

- the scene is four hierarchical feature grids + tiny MLP decoders,
- tracking optimizes a 7-DoF camera tensor per frame by differentiable
  volume rendering against a frozen map,
- mapping jointly optimizes grid features (+ decoders, + poses) over a
  keyframe window.

Unlike the reference (3 OS processes + shared-memory CUDA tensors), the
TPU engine is a functional core: map state is a pytree, tracking and
mapping are pure jitted ``state, frame -> state`` updates scheduled by a
single host loop (the reference's ``strict`` sync mode is literally
sequential; see reference src/Tracker.py:161-175 / src/Mapper.py:550-563).
Multi-chip scaling uses jax.sharding meshes instead of shared memory.
"""

__version__ = "0.1.0"
