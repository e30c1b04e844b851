from isac_tpu.utils.sequences import gold_sequence, prbs_x1, prbs_x2
from isac_tpu.utils.windows import window
from isac_tpu.utils import geometry

__all__ = ["gold_sequence", "prbs_x1", "prbs_x2", "window", "geometry"]
