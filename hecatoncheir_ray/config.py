"""Engine configuration.

Replaces the reference's ``g_config`` global singleton
(/root/reference/Hecatoncheir/include/containers.h:2223-2238) with an explicit
dataclass passed to pipeline builders.  The pipeline stage toggles mirror
``queryPipeline`` (containers.h:1904-1909): MBRFilter / IntermediateFilter /
Refinement — essential for testing each stage against an oracle.
"""

from __future__ import annotations

from dataclasses import dataclass, field


# The reference's benchmark dataspace: TIGER US bounds
# (/root/reference/Hecatoncheir/resources/config_cluster.ini,
#  driver/driver.cpp:9-11)
TIGER_US_BOUNDS = (-124.773, 24.5214, -66.9496, 49.3844)


@dataclass(frozen=True)
class GridSpec:
    """Uniform fine grid over a dataspace.

    The reference uses a two-level grid (coarse 109x109 distribution grid x
    8x8 fine cells, config_cluster.ini [Partitioning]); under Ray Data the
    shuffle key is the fine ``cell_id`` directly and node placement is the
    scheduler's job, so one level suffices.  ``ppd`` = partitions per
    dimension.
    """
    minx: float
    miny: float
    maxx: float
    maxy: float
    ppd: int = 128

    @property
    def cell_w(self) -> float:
        return (self.maxx - self.minx) / self.ppd

    @property
    def cell_h(self) -> float:
        return (self.maxy - self.miny) / self.ppd


@dataclass
class EngineConfig:
    """All knobs for the spatial pipelines."""
    # dataspace; None = compute from data (extra pass over the MBR columns)
    dataspace: tuple[float, float, float, float] | None = None
    ppd: int = 128

    # pipeline toggles (reference containers.h:1904-1909)
    mbr_filter: bool = True
    intermediate_filter: bool = False     # APRIL
    refinement: bool = True

    # APRIL config (reference containers.h:66-96: N=16, uncompressed)
    april_n: int = 16

    # execution knobs
    # NOTE: no explicit map_batches batch_size on the assign/APRIL stages —
    # Ray bundles input blocks up to batch_size rows per task, which caps
    # stage parallelism (measured: one 24s task for a whole layer); whole
    # blocks (batch_size=None) parallelize by block count instead.
    assign_batch_size: int = 32768        # legacy; kept for fingerprints
    pair_chunk: int = 1 << 22             # max |R|x|S| bools per brute chunk
    # shuffle key cardinality: fine cells are hashed into this many coarse
    # partitions; one kernel call handles all cells of a partition.  Size to
    # ~4-8x total cluster cores (tasks stay balanced, per-call overhead
    # amortizes across cells).
    shuffle_parts: int = 256
    # hot-cell handling: split any cell whose assigned rows exceed this into
    # sub-cells (salting preserves the reference-point dedup rule because the
    # sub-cells partition the cell)
    hot_cell_rows: int = 4096
    # detect_hot_cells row-sample fraction (deterministic coordinate-hash
    # sample; floored so a hot cell still contributes >= 32 expected
    # sampled replicas, and forced to 1.0 — exact counting — when
    # hot_cell_rows is small enough that sampling could miss)
    hot_cell_sample: float = 1.0 / 64.0
    salt_factor: int = 4                  # hot cells split salt_factor^2 ways
    # "split": refine hot cells into salt_factor^2 geometric sub-cells
    # (adaptive cell splitting — rows go only to sub-cells they overlap).
    # "salt": hash-salt hot cells into salt_factor x salt_factor buckets
    # (R by hash row, S by hash column, each replicated salt_factor times)
    # — caps group size even under degenerate identical-MBR stacking,
    # where geometric splitting cannot separate anything.
    skew_strategy: str = "split"
    # detect hot cells automatically before the join (one extra streaming
    # pass over the MBR columns) and salt them -- default ON so a skewed
    # dataset cannot serialize one shuffle group; benches on known-uniform
    # synthetic layers opt out explicitly
    auto_salt: bool = True

    grid: GridSpec | None = field(default=None)

    def with_auto_ppd(self, n_rows: int, workers: int | None = None,
                      target_per_cell: int = 64) -> "EngineConfig":
        """Return a copy with ppd sized to the workload (reference
        adjustPartitions analog, src/config/parse.cpp:165-178).

        ppd ~ sqrt(n_rows / target_per_cell) rounded to a power of two
        (cells average ~target_per_cell rows, bounding the per-cell
        all-pairs work), clamped to [16, 4096]; then the reference's
        load-balance nudge ``ppd += (ppd %% workers) + 1`` applied
        verbatim (parse.cpp:170-172).  NOTE: the reference arithmetic
        only lands on ``ppd %% workers == 1`` for some (ppd, workers)
        combinations — e.g. workers=7, ppd=16 -> 19, 19%%7=5.  We mirror
        the quirk rather than the intent, for partitioning parity.
        """
        import dataclasses
        import math
        raw = max(int(math.sqrt(max(n_rows, 1) / target_per_cell)), 1)
        ppd = 1 << max(raw.bit_length() - 1, 0)
        if raw - ppd > (2 * ppd) - raw:
            ppd <<= 1
        ppd = min(max(ppd, 16), 4096)
        if workers and workers > 1:
            mod = ppd % workers
            if mod != 1:
                ppd += mod + 1          # parse.cpp:170-172
        return dataclasses.replace(self, ppd=ppd)

    def make_grid(self, bounds=None) -> GridSpec:
        b = self.dataspace or bounds
        if b is None:
            raise ValueError("dataspace bounds required (set cfg.dataspace "
                             "or pass computed bounds)")
        return GridSpec(*b, ppd=self.ppd)


def join_parallelism(requested: int = 64) -> int:
    """Hash-join partition count clamped to the cluster's CPU budget.

    Ray's hash-shuffle join spawns min(num_partitions, 64) aggregator
    ACTORS, each reserving CPU proportional to its partition share plus
    an estimated partition's memory.  Requesting more partitions than
    the cluster has cores starves the actor pool behind the producer
    tasks and deadlocks a small session (observed: 16 partitions hang a
    4-CPU session; 8 run).  On a multi-node cluster the CPU total grows
    with the cluster, so this keeps join width proportional to it.
    """
    import ray
    cpus = 8.0
    if ray.is_initialized():
        cpus = ray.cluster_resources().get("CPU", 8.0)
    return max(1, min(int(requested), int(cpus)))


def arrow_schema_of(ds):
    """The Dataset's pyarrow schema, or None for pandas-born datasets
    whose Ray schema holds numpy dtypes instead of Arrow types."""
    import pyarrow as pa
    base = getattr(ds.schema(), "base_schema", None)
    return base if isinstance(base, pa.Schema) else None


def repair_join_empties(ds, schema):
    """Repair schema-less empty partition blocks emitted by Dataset.join.

    An empty hash partition finalizes to a ZERO-COLUMN table (observed on
    Ray 2.49: joining that output again fails with 'No match ... for key
    field reference' since the key column is gone).  Rewrites such blocks
    to typed empties; passes every other block through untouched.  No-op
    when ``schema`` is None (pandas-born input with no Arrow schema)."""
    if schema is None:
        return ds

    def fix(t):
        if t.num_columns == 0:
            return schema.empty_table()
        return t

    return ds.map_batches(fix, batch_format="pyarrow")
