"""ocean_perception_tpu — a TPU-native underwater-robot perception framework.

A ground-up JAX/XLA/Pallas/pjit rebuild of the capabilities of the C++/CUDA
reference stack `miloknowles/ocean-perception`:

- ``imaging``   — Sea-thru-style underwater image enhancement (backscatter +
  attenuation correction), fully jittable and batchable.
- ``stereo``    — dense stereo disparity: fused cost-volume kernels (Pallas),
  PatchMatch-semantics propagation, SGM aggregation, block matching; one API.
- ``tracking``  — sparse feature front-end: corner detection, pyramidal LK
  optical flow, stripe stereo matching, fixed-slot track tables.
- ``mesher``    — obstacle meshing: foreground masks, evidence-weighted
  landmark graphs, Delaunay triangulation.
- ``vio``       — visual-inertial odometry: IMU preintegration, error-state
  EKF, LM pose odometry, fixed-lag smoother — all pure functions.
- ``datasets``  — EuRoC/HIMB/CADDY/ACFR loaders, chronological playback.
- ``fabric``    — host-side pub/sub + shared-memory image transport.
- ``parallel``  — multi-camera sharding over TPU meshes (ICI).
- ``models``    — composed end-to-end pipelines (the flagship perception step).
- ``ops``       — the kernel library the above are built from (jnp + Pallas).

Design stance (vs the reference, see SURVEY.md): pure functions and explicit
state pytrees instead of threads + mutable queues; fixed-capacity slot arrays
with validity masks instead of dynamic containers; `lax.scan`/`fori_loop`
instead of data-dependent control flow; sharded batch axes over an ICI mesh
instead of process-level pub/sub inside the accelerator domain.
"""

__version__ = "0.1.0"
