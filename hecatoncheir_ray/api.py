"""Compatibility facade mirroring the reference's C++ API surface
(/root/reference/Hecatoncheir/API/Hecatoncheir.h:14-81) so a reference user
can port a driver program almost line-for-line:

    reference (C++)                      here (python)
    ---------------------------------    --------------------------------
    hec::init(...)                       eng = Hecatoncheir()
    hec::prepareDataset(path,ft,dt,p)    eng.prepare_dataset(path,ft,dt)
    hec::partition({r,s})                eng.partition([r,s])
    hec::buildIndex({r,s}, IT_*)         eng.build_index([r,s], "two_layer")
    hec::query(&PredicateJoinQuery)      eng.query(PredicateJoinQuery(...))
    hec::query(batch, Q_RANGE)           eng.query_batch(batch)
    hec::loadRangeQueriesFromFile        eng.load_range_queries_from_file
    hec::loadKNNQueriesFromFile          eng.load_knn_queries_from_file
    hec::unloadDataset(id)               eng.unload_dataset(id)
    hec::finalize()                      (nothing to tear down)

Differences by design: partition/build_index are *logical* (the single Ray
Data shuffle in query() replaces MPI partitioning + per-node index builds,
SURVEY.md §3); results come back as pandas DataFrames / counts instead of
QResultBase objects.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .config import EngineConfig

# result types (API/def.h QR_*)
QR_COUNT = "count"
QR_COLLECT = "collect"


@dataclass
class PredicateJoinQuery:
    dataset_r: int
    dataset_s: int
    query_id: int
    predicate: str              # one of pipelines.spatial_join.PREDICATES
    result_type: str = QR_COLLECT


@dataclass
class RangeQuery:
    query_id: int
    gtype: int
    coords: np.ndarray
    dataset: int
    result_type: str = QR_COUNT


@dataclass
class KNNQuery:
    query_id: int
    x: float
    y: float
    dataset: int
    k: int = 1


@dataclass
class DistanceJoinQuery:
    dataset_r: int
    dataset_s: int
    query_id: int
    result_type: str
    distance: float


# -- query wire serialization -------------------------------------------
# Analog of Query::createFromBuffer / serialize (reference
# API/containers.h:312): the reference packs queries into MPI byte
# buffers; a Ray job-submission path ships them the same way (e.g. as a
# job payload or over a socket).  Format: 4-byte little-endian length +
# JSON body {"kind": <class>, ...fields}, coords as a float64 list.

_QUERY_KINDS: dict[str, type] = {}


def _register_query(cls):
    _QUERY_KINDS[cls.__name__] = cls
    return cls


for _c in (PredicateJoinQuery, RangeQuery, KNNQuery, DistanceJoinQuery):
    _register_query(_c)


def pack_query(q) -> bytes:
    """Query dataclass -> length-prefixed wire buffer."""
    import json
    import struct
    kind = type(q).__name__
    if kind not in _QUERY_KINDS:
        raise TypeError(f"not a query type: {kind}")
    d = dict(q.__dict__)
    if isinstance(q, RangeQuery):
        d["coords"] = np.asarray(q.coords, dtype=np.float64).tolist()
    blob = json.dumps({"kind": kind, **d}, sort_keys=True).encode()
    return struct.pack("<I", len(blob)) + blob


def unpack_query(buf: bytes):
    """Wire buffer -> query dataclass (createFromBuffer analog).

    Raises ValueError on a truncated buffer or unknown query kind."""
    import json
    import struct
    if len(buf) < 4:
        raise ValueError("query buffer truncated (no length prefix)")
    (n,) = struct.unpack_from("<I", buf, 0)
    if len(buf) < 4 + n:
        raise ValueError(f"query buffer truncated ({len(buf) - 4} of "
                         f"{n} body bytes)")
    d = json.loads(buf[4:4 + n].decode())
    kind = d.pop("kind", None)
    cls = _QUERY_KINDS.get(kind)
    if cls is None:
        raise ValueError(f"unknown query kind {kind!r}")
    if cls is RangeQuery:
        d["coords"] = np.asarray(d["coords"], dtype=np.float64)
    return cls(**d)


class Hecatoncheir:
    """One engine instance == the reference's global config + datasets."""

    def __init__(self, cfg: EngineConfig | None = None):
        self.cfg = cfg or EngineConfig()
        self._datasets: dict[int, object] = {}   # id -> pa.Table
        self._next = 0

    # -- dataset lifecycle --------------------------------------------------

    def prepare_dataset(self, path: str, file_type: str = "WKT",
                        data_type: str | None = None,
                        persist: bool = False) -> int:
        from .sources.readers import load_csv_table, load_wkt_table
        if file_type.upper() == "WKT":
            t = load_wkt_table(path, data_type)
        elif file_type.upper() == "CSV":
            t = load_csv_table(path, data_type)
        else:
            raise ValueError(f"unsupported file type {file_type!r}")
        did = self._next
        self._next += 1
        self._datasets[did] = t
        return did

    def register_dataset(self, table) -> int:
        """Ray-native extension: register an in-memory geometry table."""
        did = self._next
        self._next += 1
        self._datasets[did] = table
        return did

    def partition(self, ids) -> int:
        """Compute/cache the global dataspace (the reference's partition
        phase; the physical shuffle happens lazily inside query())."""
        if self.cfg.dataspace is None:
            minx = miny = np.inf
            maxx = maxy = -np.inf
            for i in ids:
                t = self._datasets[i]
                if len(t) == 0:
                    continue
                minx = min(minx, min(t["minx"].to_pylist()))
                miny = min(miny, min(t["miny"].to_pylist()))
                maxx = max(maxx, max(t["maxx"].to_pylist()))
                maxy = max(maxy, max(t["maxy"].to_pylist()))
            w = max(maxx - minx, 1e-9) * 1e-9
            h = max(maxy - miny, 1e-9) * 1e-9
            self.cfg.dataspace = (minx - w, miny - h, maxx + w, maxy + h)
        return 0

    #: accepted index types (reference include/containers.h:1998-2107,
    #: IT_TWO_LAYER / IT_UNIFORM_GRID).  Both map to the SAME physical
    #: plan here: the reference's uniform grid assigns an object to every
    #: overlapped cell and dedups join pairs by reference point, while
    #: its two-layer variant pre-classifies objects into A/B/C/D corner
    #: classes to skip the dedup — two traversals of one partitioning.
    #: Under Ray Data the groupby(cell) shuffle materializes the exact
    #: same (cell, object) assignment, and the sweep kernel applies the
    #: reference-point rule (grid.py:67), which is the uniform-grid
    #: dedup semantics and provably emits each pair exactly once — the
    #: identical pair set the two-layer classes produce.  Equivalence is
    #: pinned by tests/test_api.py::test_index_type_equivalence on the
    #: reference's own golden scenarios.
    INDEX_TYPES = ("two_layer", "uniform_grid")

    def build_index(self, ids, index_type: str = "two_layer") -> int:
        """Logical no-op: the groupby(cell) shuffle IS the index build.

        ``index_type`` is validated (no silent string acceptance); see
        INDEX_TYPES for why both reference flags share one plan."""
        it = index_type.lower().removeprefix("it_")
        if it not in self.INDEX_TYPES:
            raise ValueError(
                f"unknown index type {index_type!r}; expected one of "
                f"{self.INDEX_TYPES} (reference IT_TWO_LAYER / "
                f"IT_UNIFORM_GRID, containers.h:1998)")
        self._index_type = it
        return 0

    def unload_dataset(self, did: int) -> int:
        self._datasets.pop(did, None)
        return 0

    # -- queries ------------------------------------------------------------

    def _ds(self, did: int):
        import ray.data as rd
        return rd.from_arrow(self._datasets[did])

    def query(self, q):
        from .pipelines.distance_join import distance_join
        from .pipelines.spatial_join import (relation_histogram,
                                             spatial_join)
        if isinstance(q, PredicateJoinQuery):
            out = spatial_join(self._ds(q.dataset_r), self._ds(q.dataset_s),
                               q.predicate, self.cfg)
            if q.result_type == QR_COUNT:
                if q.predicate == "find_relation":
                    return relation_histogram(out)
                return out.count()
            return out.to_pandas()
        if isinstance(q, DistanceJoinQuery):
            out = distance_join(self._ds(q.dataset_r), self._ds(q.dataset_s),
                                q.distance, self.cfg)
            return out.count() if q.result_type == QR_COUNT \
                else out.to_pandas()
        raise TypeError(f"unsupported query type {type(q).__name__}")

    def query_batch(self, batch):
        """Batch range or kNN queries (one pass over the dataset for the
        whole batch, SURVEY §3 EP2)."""
        from .pipelines.knn import knn_query
        from .pipelines.range_query import range_query
        if not batch:
            return {}
        if isinstance(batch[0], RangeQuery):
            by_ds: dict[int, list[RangeQuery]] = {}
            for q in batch:
                by_ds.setdefault(q.dataset, []).append(q)
            results = {}
            for did, qs in by_ds.items():
                wins = [(q.query_id, q.gtype, q.coords) for q in qs]
                want_count = {q.query_id: q.result_type == QR_COUNT
                              for q in qs}
                collect = range_query(self._ds(did), wins).to_pandas()
                for q in qs:
                    sub = collect[collect.query_id == q.query_id]
                    results[q.query_id] = len(sub) if want_count[q.query_id] \
                        else sorted(sub["id"].tolist())
            return results
        if isinstance(batch[0], KNNQuery):
            by_ds = {}
            for q in batch:
                by_ds.setdefault((q.dataset, q.k), []).append(q)
            results = {}
            for (did, k), qs in by_ds.items():
                out = knn_query(self._ds(did),
                                [(q.query_id, q.x, q.y) for q in qs],
                                k).to_pandas()
                for q in qs:
                    sub = out[out.query_id == q.query_id]
                    results[q.query_id] = sub["id"].tolist()
            return results
        raise TypeError(f"unsupported batch type {type(batch[0]).__name__}")

    # -- query file loaders (API/Hecatoncheir.cpp:736-836) -------------------

    def load_range_queries_from_file(self, path: str, file_type: str,
                                     dataset: int,
                                     result_type: str = QR_COUNT):
        from .sources.readers import load_wkt_table
        t = load_wkt_table(path)
        return [RangeQuery(int(r["id"]), int(r["gtype"]),
                           np.asarray(r["coords"]), dataset, result_type)
                for r in t.to_pylist()]

    def load_knn_queries_from_file(self, path: str, file_type: str,
                                   dataset: int, k: int):
        from .sources.readers import load_wkt_table
        t = load_wkt_table(path, "POINT")
        return [KNNQuery(int(r["id"]), r["coords"][0], r["coords"][1],
                         dataset, k) for r in t.to_pylist()]
