from impop_tpu.stats.types import SimTile, sim_tile_from_matrix, pad_tile
from impop_tpu.stats.grouping import greedy_group, group_sizes, label_components
from impop_tpu.stats.pi import pi_grouped, grouped_diversity
from impop_tpu.stats.diversity import direct_diversity
from impop_tpu.stats.fst import hudson_fst_direct, hudson_fst_grouped, fst_3pi
from impop_tpu.stats.tajima import tajimas_d, tajima_constants

__all__ = [
    "SimTile",
    "sim_tile_from_matrix",
    "pad_tile",
    "greedy_group",
    "group_sizes",
    "label_components",
    "pi_grouped",
    "grouped_diversity",
    "direct_diversity",
    "hudson_fst_direct",
    "hudson_fst_grouped",
    "fst_3pi",
    "tajimas_d",
    "tajima_constants",
]
