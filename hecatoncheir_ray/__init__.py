"""hecatoncheir_ray — a Ray-Data-native distributed spatial engine.

A from-scratch rebuild of the capabilities of ThanGeo/Hecatoncheir
(/root/reference, read-only) on ray.data.Dataset streaming pipelines:
grid-partitioned spatial joins (MBR filter -> APRIL intermediate filter ->
exact DE-9IM refinement), range queries, kNN, distance joins, plus the
training-data operators a 100 TB image+caption pipeline needs (dedup,
similarity search, text analysis, image tiling).
"""

from .config import EngineConfig, GridSpec, TIGER_US_BOUNDS
from .pipelines.distance_join import distance_join
from .pipelines.knn import knn_query
from .pipelines.range_query import range_query
from .pipelines.spatial_join import (attach_payload, compute_dataspace,
                                     detect_hot_cells, relation_histogram,
                                     spatial_join, spatial_join_auto,
                                     spatial_join_broadcast,
                                     spatial_join_semi)
from .pipelines.tiling import tile_assignments, tile_counts, tile_cover

__all__ = ["EngineConfig", "GridSpec", "TIGER_US_BOUNDS", "spatial_join",
           "spatial_join_auto", "spatial_join_broadcast",
           "spatial_join_semi",
           "compute_dataspace", "detect_hot_cells", "attach_payload",
           "relation_histogram", "distance_join", "knn_query",
           "range_query", "tile_assignments", "tile_cover", "tile_counts"]
__version__ = "0.1.0"
