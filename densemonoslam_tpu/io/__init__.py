from densemonoslam_tpu.io.synthetic import SyntheticSequence, BoxRoomScene, render_frame
from densemonoslam_tpu.io.writers import save_freiburg, save_ply, load_ply

__all__ = [
    "SyntheticSequence",
    "BoxRoomScene",
    "render_frame",
    "save_freiburg",
    "save_ply",
    "load_ply",
]
