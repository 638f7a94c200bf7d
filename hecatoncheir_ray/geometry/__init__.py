from .core import (EPS, GT_BOX, GT_LINESTRING, GT_POINT, GT_POLYGON,
                   GTYPE_NAMES, coords_to_pts, correct_ring, format_wkt,
                   from_wkb, mbr_of, parse_wkt, pts_to_coords, to_wkb)
from .predicates import (MBR_CROSS, MBR_EQUAL, MBR_INTERSECT, MBR_R_IN_S,
                         MBR_S_IN_R, TR_CONTAINS, TR_COVERED_BY, TR_COVERS,
                         TR_DISJOINT, TR_EQUAL, TR_INSIDE, TR_INTERSECT,
                         TR_MEET, TR_NAMES, find_relation, point_distance,
                         points_in_ring, predicate, relate, relate_mbrs)
from .fast import eval_predicate, fast_intersects, points_in_polygon_batch
from .simplify import (dp_keep_mask, ring_keep_mask, simplify_lines,
                       simplify_polygons)

__all__ = [n for n in dir() if not n.startswith("_")]
