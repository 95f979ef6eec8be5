"""Frozen dataclass configs for the five CFFM configurations.

Covers SURVEY.md §1.2's config table (ref: BASELINE.json "configs").
Reference hyperparameters were unavailable (empty mount, SURVEY.md §0),
so defaults follow the CCPM/FFM family conventions and are pinned here
as this framework's own ground truth; the torch-CPU oracle
(oracle/torch_cffm.py) uses the same values.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """CFFM model hyperparameters.

    The cross construction is pluggable (SURVEY.md §1.1):
      - "hadamard":    p_ij = e_i * e_j              (FM-style)
      - "field_aware": p_ij = e_{i->j} * e_{j->i}    (FFM-style, namesake)
    """

    num_fields: int
    vocab_sizes: Tuple[int, ...]  # per-field hash-bucket counts
    embed_dim: int = 16
    cross: str = "field_aware"  # "hadamard" | "field_aware"
    conv_channels: Tuple[int, ...] = (64, 64)
    conv_kernel: int = 3  # 1D kernel width along the embed-dim axis
    conv_pool: int = 2  # max-pool factor along embed-dim after each conv
    tower_hidden: Tuple[int, ...] = (256, 128)
    num_dense: int = 0  # continuous features appended to the tower input
    use_first_order: bool = True  # FM first-order linear term
    compute_dtype: str = "bfloat16"  # matmul/conv activations dtype
    param_dtype: str = "float32"
    # Embedding-table storage dtype. "bfloat16" halves table HBM and
    # lookup-gather traffic; per-row updates then go through
    # gather-modify-write with optim.table_rounding (stochastic by
    # default — round-to-nearest drops sub-ulp updates). Optimizer
    # state stays f32 either way.
    table_dtype: str = "float32"
    use_pallas: bool = True  # fused cross+conv kernel (auto-interprets off-TPU)
    # Hybrid lookup: the LEADING fields whose vocab <= this threshold
    # are looked up by one-hot MXU matmuls against a VMEM-scale table
    # prefix (differentiable -> dense per-row update) instead of the
    # HBM row gather, and their ids leave the sort/dedup/scatter
    # pipeline entirely. Criteo's 13 integer-bucket fields (vocab 64,
    # 832 rows ~ 1 MB) are 1/3 of both 39-ms row gathers at the bench
    # point (docs/PLATFORM_NOTES.md budget) for one-off matmul work.
    # Engages on the field-major train path with adagrad/sgd; 0 = off.
    small_field_threshold: int = 512

    def __post_init__(self):
        assert len(self.vocab_sizes) == self.num_fields
        assert self.cross in ("hadamard", "field_aware")

    @property
    def num_pairs(self) -> int:
        f = self.num_fields
        return f * (f - 1) // 2

    @property
    def row_width(self) -> int:
        """Logical embedding row width: d (hadamard) or F*d (field-aware)."""
        if self.cross == "field_aware":
            return self.num_fields * self.embed_dim
        return self.embed_dim

    @property
    def table_width(self) -> int:
        """Physical table row width: padded to a 128-lane multiple when
        the overhead is small — measured 8x faster TPU gathers (XLA's
        dynamic gather runs at ~200GB/s on 128-aligned rows vs ~25GB/s
        unaligned; docs/PLATFORM_NOTES.md)."""
        w = self.row_width
        padded = ((w + 127) // 128) * 128
        if w > 128 and (padded - w) * 10 <= w:  # <=10% overhead
            return padded
        return w

    @property
    def fused_linear(self) -> bool:
        """First-order weights live in the table's lane-padding column
        (col row_width) when padding exists: one gather/dedup/scatter
        serves both the embeddings and the linear term."""
        return self.use_first_order and self.table_width > self.row_width

    @property
    def total_vocab(self) -> int:
        return int(sum(self.vocab_sizes))

    @property
    def small_field_prefix(self) -> int:
        """Number of LEADING fields with vocab <= small_field_threshold
        (the hybrid one-hot lookup works on a contiguous table prefix;
        small fields after a big one simply don't qualify). The prefix
        is capped so its row block stays VMEM-scale (<= 4096 rows)."""
        if self.small_field_threshold <= 0:
            return 0
        fs, rows = 0, 0
        for v in self.vocab_sizes:
            if v > self.small_field_threshold or rows + v > 4096:
                break
            fs += 1
            rows += int(v)
        return fs

    @property
    def small_rows(self) -> int:
        """Rows of the small-field table prefix ([0, small_rows))."""
        return int(sum(self.vocab_sizes[: self.small_field_prefix]))

    @property
    def conv_out_dim(self) -> int:
        """Flattened conv-core output size fed to the tower."""
        d = self.embed_dim
        for _ in self.conv_channels:
            d = d // self.conv_pool
        assert d >= 1, "embed_dim too small for this many pool layers"
        return d * (self.conv_channels[-1] if self.conv_channels else self.num_pairs)


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    """Dense tower/conv use optax; sparse tables use per-row updates
    colocated with the shards (SURVEY.md §3, "Per-row sparse optimizer")."""

    dense_optimizer: str = "adam"  # "adam" | "adagrad" | "sgd"
    dense_lr: float = 1e-3
    # "adagrad" (row-scalar accumulator) | "adam" (full m/v) |
    # "rowwise_adam" (full m, row-scalar v: Adam at half the state HBM)
    # | "sgd"
    sparse_optimizer: str = "adagrad"
    sparse_lr: float = 1e-2
    adagrad_init: float = 0.1  # initial accumulator value
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    eps: float = 1e-8
    weight_decay: float = 0.0
    # Global-norm clip on the dense grads (0 = off), applied inside the
    # optax chain before the optimizer; sparse row grads are clipped
    # per-row to the same norm (a global norm over a 100M-row table is
    # meaningless — rows are independent parameters in the FM sense).
    clip_norm: float = 0.0
    # Learning-rate schedule, applied multiplicatively to BOTH the
    # dense optax path and the sparse per-row path (so the two stay on
    # the same curve): linear warmup over `warmup_steps`, then
    # "constant" | "cosine" | "linear" decay to `end_lr_factor` of the
    # base LR across `decay_steps` (0 = data.num_train_steps).
    lr_schedule: str = "constant"  # "constant" | "cosine" | "linear"
    warmup_steps: int = 0
    decay_steps: int = 0
    end_lr_factor: float = 0.0
    # Rounding for updates into a bfloat16 table (model.table_dtype):
    # "stochastic" (unbiased, keeps sub-ulp updates in expectation) or
    # "nearest". Ignored for float32 tables.
    table_rounding: str = "stochastic"
    # Streamed table update (ops/streamed_update.py): "auto" enables the
    # full-table streaming Pallas kernel when the touched-row density
    # and table size make it beat the XLA scatter; "on"/"off" force it.
    streamed_update: str = "auto"


@dataclasses.dataclass(frozen=True)
class DataConfig:
    dataset: str = "synthetic"  # synthetic | criteo | avazu | movielens | prehashed
    path: Optional[str] = None  # TSV/.cfb/file location (None -> synthetic)
    batch_size: int = 4096  # global batch size
    # Train-stream shuffling (val streams are never shuffled).
    # Prehashed (.cfb) readers use a seeded per-epoch block+row
    # permutation; streaming TSV readers use a `shuffle_buffer`-row
    # uniform reservoir (loader.shuffled_batches). Off by default:
    # file order keeps parity paths bit-reproducible.
    shuffle: bool = False
    shuffle_buffer: int = 1 << 14
    # Negative downsampling (train stream only): keep every positive,
    # keep each negative with this probability. <1 rebalances the
    # class-skewed CTR stream; eval/score/export logits are corrected
    # by +ln(rate) automatically (metrics.calibration_offset) so
    # calibration against the TRUE distribution is preserved.
    neg_downsample: float = 1.0
    num_train_steps: int = 1000
    eval_every: int = 0  # 0 = eval only at the end
    eval_batches: int = 32
    # Held-out split: every val_every-th chunk/example is reserved for
    # eval and never trained on (0 disables; eval then reuses the train
    # stream — only sensible for smoke tests). SURVEY.md §5.4.
    val_every: int = 10
    # Parse worker threads for the native readers (the C++ parser
    # releases the GIL; >1 needed to feed >1M rows/s). 1 = single-thread.
    reader_threads: int = 4
    # Host->device wire format for the TRAIN stream. "packed" ships
    # ids as uint8/uint16(+bit-packed high bits), dense as float16 and
    # labels as uint8 (data/wire.py) — ~2.2x fewer bytes over the
    # bandwidth-bound H2D link (~54 MB/s on this rig, and transfers
    # serialize with compute: scripts/probe_h2d.py). ids/labels are
    # bit-exact; dense rounds to f16. "raw" ships int32/f32.
    wire_format: str = "raw"
    seed: int = 0


@dataclasses.dataclass(frozen=True)
class ShardingConfig:
    """Mesh layout (SURVEY.md §3.1).

    One flat device axis "data" carries both roles: the batch is
    data-parallel over it AND embedding-table rows are mod-sharded over
    it (DLRM-style model-parallel tables + DP dense). `table_shards`
    ≤ #devices selects how many devices hold table shards.
    """

    data_axis: str = "data"
    table_sharded: bool = False  # False -> tables replicated (1-chip cfgs)
    # "global": one flat axis over all devices (lookup all-to-all may
    # cross DCN). "intra_host": 2D ("host","chip") mesh — tables sharded
    # within each host, replicated across; lookup rides ICI only and
    # table grads psum over "host" (parallel/dcn_mesh.py; SURVEY.md M5).
    # "hier": 2D ("host","chip") mesh with the SAME flat table layout as
    # "global" but a two-stage exchange with HOST-LEVEL dedup — each
    # host-distinct row crosses DCN once per direction instead of once
    # per requesting chip (parallel/hier_embedding.py). The multi-host
    # default: docs/SCALING_MODEL.md §4 shows the flat exchange caps
    # 2-host scaling at ~9-14% while hier reaches the ≥85% band.
    table_axis: str = "global"
    # Per-peer all-to-all bucket slack. Capacity per (shard, peer) bucket is
    # ceil(n_local_ids / T) * factor, lane-rounded, hard-capped by the static
    # distinct-id bound (sum_f min(vocab_f, local_batch)) so T=1 and small
    # vocabs can never overflow. Sizing rule: uniques per bucket concentrate
    # around unique_bound/T under uniform ids, LOWER under Zipf skew (hot ids
    # dedup into one slot), so 2.0 covers any skew; overflow (counted in step
    # metrics as "overflow", psum'd) means dropped embeddings/grads for the
    # excess ids — if it is ever nonzero in production, raise this factor.
    # Tested under forced overflow: training stays finite and the counter
    # reports (tests/test_sharded_train.py::test_sharded_step_under_forced_overflow).
    id_capacity_factor: float = 2.0
    # ABSOLUTE per-peer bucket row budgets, overriding the factor
    # formula when > 0 (still hard-capped by the correctness caps; at
    # T=1 the full distinct bound is always covered). Size these from
    # measured occupancy (scripts/measure_id_stats.py; measured table in
    # docs/SCALING_MODEL.md §2.6): the worst-case formula pads the
    # exchange 7-14x over the measured Zipf bucket loads.
    # cap_rows: flat exchange / hierarchical stage-1 (ICI) buckets.
    # cap_rows_host: hierarchical stage-2 (DCN) buckets.
    cap_rows: int = 0
    cap_rows_host: int = 0
    dedup: bool = True


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    name: str
    model: ModelConfig
    optim: OptimizerConfig = OptimizerConfig()
    data: DataConfig = DataConfig()
    sharding: ShardingConfig = ShardingConfig()
    log_every: int = 50
    checkpoint_dir: Optional[str] = None
    checkpoint_every: int = 0  # steps; 0 = disabled
    # Optional TensorBoard event-file output (SURVEY.md §6 metrics row);
    # JSONL on stdout stays the primary log either way.
    tensorboard_dir: Optional[str] = None
    # Debug aid for collective-order hangs (SURVEY.md §6 race row): log
    # a host-callback heartbeat around each collective region so a
    # cross-host deadlock shows WHERE it stuck instead of hanging mute.
    debug_barriers: bool = False


# ---------------------------------------------------------------------------
# The five named configs (SURVEY.md §1.2 / BASELINE.json "configs")
# ---------------------------------------------------------------------------

# Criteo-Kaggle: 13 integer features (bucketized to categorical) + 26
# categorical = 39 fields.
_CRITEO_FIELDS = 39
# Integer features get small bucket vocabularies; categorical features get
# hashed buckets.
_CRITEO_VOCABS = tuple([64] * 13 + [100_000] * 26)

# Avazu: 24 columns = id, click, hour + 21 features; hour is expanded to
# (hour-of-day, day-of-week) -> 23 categorical fields.
_AVAZU_FIELDS = 23
_AVAZU_VOCABS = tuple([32, 8] + [50_000] * 21)

# MovieLens-1M: user, movie, gender, age, occupation, zip, genre -> 7 fields.
_ML1M_VOCABS = (6100, 4000, 2, 8, 22, 3500, 19)


def _movielens() -> TrainConfig:
    return TrainConfig(
        name="movielens",
        model=ModelConfig(
            num_fields=7,
            vocab_sizes=_ML1M_VOCABS,
            embed_dim=16,
            cross="field_aware",
            conv_channels=(32, 32),
            tower_hidden=(128, 64),
        ),
        data=DataConfig(dataset="movielens", batch_size=1024, num_train_steps=2000),
        optim=OptimizerConfig(sparse_optimizer="adagrad"),
        sharding=ShardingConfig(table_sharded=False),
    )


def _criteo_kaggle() -> TrainConfig:
    return TrainConfig(
        name="criteo_kaggle",
        model=ModelConfig(
            num_fields=_CRITEO_FIELDS,
            vocab_sizes=_CRITEO_VOCABS,
            embed_dim=16,
            cross="field_aware",
            num_dense=13,
        ),
        data=DataConfig(dataset="criteo", batch_size=4096),
        sharding=ShardingConfig(table_sharded=False),
    )


def _avazu() -> TrainConfig:
    return TrainConfig(
        name="avazu",
        model=ModelConfig(
            num_fields=_AVAZU_FIELDS,
            vocab_sizes=_AVAZU_VOCABS,
            embed_dim=16,
            cross="field_aware",
        ),
        data=DataConfig(dataset="avazu", batch_size=4096),
        optim=OptimizerConfig(sparse_optimizer="adagrad"),
        sharding=ShardingConfig(table_sharded=True),
    )


def _criteo_full() -> TrainConfig:
    return TrainConfig(
        name="criteo_full",
        model=ModelConfig(
            num_fields=_CRITEO_FIELDS,
            vocab_sizes=tuple([64] * 13 + [1_000_000] * 26),
            embed_dim=16,
            cross="field_aware",
            num_dense=13,
            # bf16 tables halve per-shard HBM + gather traffic; updates
            # use stochastic rounding. Quality validated on silicon
            # 2026-08-18: criteo flagship eval AUC 0.61865 (bf16) vs
            # 0.61866 (f32); speed 338.7K vs 307.0K ex/s/chip.
            table_dtype="bfloat16",
        ),
        data=DataConfig(dataset="criteo", batch_size=32768),
        sharding=ShardingConfig(table_sharded=True),
    )


def _multihost() -> TrainConfig:
    cfg = _criteo_full()
    # Hierarchical host-level-dedup exchange: the flat all-to-all ships
    # each row once per REQUESTING CHIP over DCN (~9-14% projected
    # 2-host efficiency at criteo_full shapes); "hier" ships each
    # host-distinct row once per HOST — the layout that reaches the
    # ≥85% band (docs/SCALING_MODEL.md §4).
    # Bucket capacities sized from MEASURED occupancy on the Zipf(1.3)
    # bench stream at the 2-host point (2x8 chips, global batch 131072;
    # scripts/measure_id_stats.py 2026-08-20): stage-1 worst bucket
    # 4486 -> 8192 (1.8x margin), stage-2 worst 10251 -> 16384 (1.6x).
    # The worst-case formula would pad stage 2 to 79872 slots (7.8x the
    # measured load) and blow the DCN budget; the overflow counter in
    # step metrics is the production guard — if it ever reads nonzero,
    # raise these.
    return dataclasses.replace(
        cfg, name="multihost",
        sharding=dataclasses.replace(cfg.sharding, table_axis="hier",
                                     cap_rows=8192, cap_rows_host=16384))


_CONFIGS = {
    "movielens": _movielens,
    "criteo_kaggle": _criteo_kaggle,
    "avazu": _avazu,
    "criteo_full": _criteo_full,
    "multihost": _multihost,
}


def get_config(name: str) -> TrainConfig:
    if name not in _CONFIGS:
        raise KeyError(f"unknown config {name!r}; have {sorted(_CONFIGS)}")
    return _CONFIGS[name]()


def list_configs():
    return sorted(_CONFIGS)
