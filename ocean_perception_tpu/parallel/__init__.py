"""Multi-device scaling over TPU meshes (ICI).

The reference scales by running more LCM processes per camera rig
(SURVEY.md §2.4); the TPU-native design treats multiple camera streams as a
batch axis sharded over an ICI mesh with pjit — collectives ride ICI, the
host only feeds frames.
"""

from .mesh import make_mesh, camera_sharding, replicated  # noqa: F401
from .sharded_pipeline import (  # noqa: F401
    FleetStats,
    create_fleet_frontend_state,
    multi_camera_frontend_step,
    multi_camera_step,
    sharded_perception_step,
)
from .spatial import sharded_enhance, strip_sharding  # noqa: F401
from .stereo_sharded import sharded_patchmatch  # noqa: F401
