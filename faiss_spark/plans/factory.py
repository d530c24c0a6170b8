"""index_factory: the faiss string DSL → a build/search pipeline.

Reference: faiss/index_factory.h:17 + index_factory.cpp (grammar at
:192-804; SURVEY §2.J row 'index_factory'). The DSL is pure string →
config, so the grammar ports directly; what it *builds* here is Spark
pipelines: transform chain (operators/transforms.py) + index stage
(Flat / IVF / IVFPQ / PQ / SQ).

Supported subset (the workhorse combinations):
  transforms : PCAn | PCARn | PCAWn | RRn | ITQn | OPQn | L2norm | Padn
  main       : Flat | IVF<nlist>[(RCQ<M>x<b>|LSQ<M>x<b>)],{Flat|
               PQ<M>[x<b>]|SQ4|SQ6|SQ8|RQ<M>} | IMI2x<b>,Flat |
               PQ<M>[x<b>] | SQ4 | SQ6 | SQ8 | SQfp16 | RQ<M>
  refinement : RFlat (exact re-rank of k*k_factor candidates, reference
               IndexRefineFlat)
  binary     : BFlat | BIVF<nlist> | BHash<b> (index_binary_factory,
               reference faiss/index_factory.cpp:895-915)
e.g. "PCA32,IVF256,PQ8", "L2norm,Flat", "OPQ8,IVF64,PQ8,RFlat",
"IVF65536(RCQ2x8),Flat", "IMI2x10,Flat", "PQ8x4".

Unsupported tokens raise ValueError with the offending token — same
contract as the reference's FAISS_THROW on parse failure.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from faiss_spark.operators.transforms import (
    ITQTransform,
    OPQMatrix,
    PCAMatrix,
    Pipeline,
    RandomRotation,
    normalize_expr,
    remap_dimensions_expr,
)

_TRANSFORM_RES = [
    (re.compile(r"^PCA(\d+)$"), lambda m: PCAMatrix(int(m.group(1)))),
    (re.compile(r"^PCAR(\d+)$"), lambda m: PCAMatrix(int(m.group(1)), random_rotation=True)),
    (re.compile(r"^PCAW(\d+)$"), lambda m: PCAMatrix(int(m.group(1)), eigen_power=-0.5)),
    (re.compile(r"^RR(\d+)?$"), lambda m: RandomRotation()),
    (re.compile(r"^ITQ(\d+)?$"), lambda m: ITQTransform()),
    (re.compile(r"^OPQ(\d+)$"), lambda m: OPQMatrix(int(m.group(1)))),
]


@dataclass
class IndexPlan:
    """Parsed factory string: transform estimators + index config."""

    transforms: list = field(default_factory=list)
    sql_transforms: list = field(default_factory=list)  # ("l2norm"|"pad", arg)
    index_type: str = "flat"  # flat | ivfflat | ivfpq | ivfsq | ivfrq | pq | sq | rq
    nlist: int | None = None
    pq_m: int | None = None
    pq_nbits: int = 8
    sq_bits: int | None = None
    rq_m: int | None = None
    # additive coarse quantizer (reference RCQ/LSQ-as-quantizer factory
    # strings, faiss/index_factory.cpp parse of "IVFn(RCQMxB)")
    coarse: str | None = None  # None (k-means) | "rcq" | "lsq"
    coarse_m: int | None = None
    coarse_nbits: int | None = None
    # ZnLattice<nsq>x<r2>_<scale_nbit> (reference index_factory.cpp:535)
    lat_nsq: int | None = None
    lat_r2: int | None = None
    lat_scale_nbit: int | None = None
    # fast-scan (reference index_factory.cpp "PQ<M>x4fs[_<bbs>]"): 4-bit
    # codes searched through quantized LUTs (operators/fastscan.py). bbs
    # is the reference's SIMD block size — parsed and kept for round-trip
    # fidelity, physically meaningless on the Arrow/numpy layout.
    fastscan: bool = False
    bbs: int = 32
    # NSG<R> (reference index_factory.cpp "NSG<R>[,Flat]") — sharded
    # batch graph (operators/nsg.py)
    nsg_r: int | None = None
    refine_flat: bool = False
    flat_dedup: bool = False
    k_factor: int = 4
    metric: str = "l2"

    # fitted state
    pipeline: Pipeline | None = None
    index: object | None = None

    def fit(
        self, vectors: DataFrame, id_col: str = "id", vec_col: str = "vec",
        seed: int = 1234,
    ) -> "IndexPlan":
        """train + add (reference EP3 lifecycle, SURVEY §3.3)."""
        cur = vectors.select(
            F.col(id_col).cast("bigint").alias("id"), F.col(vec_col).alias("vec")
        )
        for kind, arg in self.sql_transforms:
            if kind == "l2norm":
                cur = cur.select("id", normalize_expr(F.col("vec")).alias("vec"))
            else:
                cur = cur.select(
                    "id", remap_dimensions_expr(F.col("vec"), arg).alias("vec")
                )
        if self.transforms:
            self.pipeline = Pipeline(list(self.transforms)).fit(cur)
            cur = self.pipeline.apply(cur)
        cur = cur.localCheckpoint(eager=False)
        self._transformed = cur

        from faiss_spark.operators.codecs import (
            ProductQuantizer,
            ResidualQuantizer,
            ScalarQuantizer,
        )
        from faiss_spark.operators.ivf import (
            IVFAQIndex,
            IVFIndex,
            IVFPQIndex,
            IVFSQIndex,
        )

        if self.index_type == "flat":
            self.index = None  # brute force over the transformed table
        elif self.index_type == "ivfflat" and self.coarse == "imi":
            from faiss_spark.operators.ivf import IMIIVFIndex

            self.index = IMIIVFIndex.train(
                cur, nbits=self.coarse_nbits, seed=seed
            ).add(cur)
        elif self.index_type == "ivfflat" and self.coarse is not None:
            from faiss_spark.operators.ivf import IVFRCQIndex

            self.index = IVFRCQIndex.train(
                cur, M=self.coarse_m, nbits=self.coarse_nbits, seed=seed,
                lsq=(self.coarse == "lsq"),
            ).add(cur)
        elif self.index_type == "ivfflat" and self.flat_dedup:
            from faiss_spark.operators.refine import dedup_flat

            dd = dedup_flat(cur).localCheckpoint(eager=False)
            reps = dd.select(F.col("rep_id").alias("id"), "vec")
            self._dedup_ids = dd.select(F.col("rep_id").alias("id"), "ids")
            self.index = IVFIndex.train(
                reps, nlist=self.nlist, metric=self.metric, seed=seed
            ).add(reps)
        elif self.index_type == "ivfflat":
            self.index = IVFIndex.train(cur, nlist=self.nlist, metric=self.metric, seed=seed).add(cur)
        elif self.index_type == "ivfpq":
            base = IVFPQIndex.train(
                cur, nlist=self.nlist, M=self.pq_m, nbits=self.pq_nbits,
                seed=seed,
            )
            if self.fastscan:
                from faiss_spark.operators.fastscan import IVFPQFastScanIndex

                self.index = IVFPQFastScanIndex(base=base).add(cur)
            else:
                self.index = base.add(cur)
        elif self.index_type == "ivfsq":
            self.index = IVFSQIndex.train(
                cur, nlist=self.nlist, bits=self.sq_bits, metric=self.metric, seed=seed
            ).add(cur)
        elif self.index_type == "ivfrq":
            self.index = IVFAQIndex.train(
                cur, nlist=self.nlist, M=self.rq_m, metric=self.metric, seed=seed
            ).add(cur)
        elif self.index_type == "ivfrqfs":
            if self.metric != "l2":
                raise ValueError(
                    "IVF<n>,RQ<M>x4fs supports METRIC_L2 only (the norm-code "
                    f"decomposition is L2-specific), got metric={self.metric!r}"
                )
            from faiss_spark.operators.fastscan import IVFAQFastScanIndex

            self.index = IVFAQFastScanIndex.train(
                cur, nlist=self.nlist, M=self.rq_m, seed=seed
            ).add(cur)
        elif self.index_type == "rq":
            model = ResidualQuantizer(M=self.rq_m, seed=seed).fit(cur)
            self._rq_model = model
            self._rq_codes = model.encode(cur)
            self.index = model
        elif self.index_type == "rqfs":
            from faiss_spark.operators.fastscan import (
                aq_fastscan_encode,
                train_aq_fastscan,
            )

            model = train_aq_fastscan(cur, M=self.rq_m, seed=seed)
            self._aqfs_model = model
            self._aqfs_codes = aq_fastscan_encode(model, cur)
            self.index = model
        elif self.index_type == "pq":
            model = ProductQuantizer(
                M=self.pq_m, nbits=self.pq_nbits, seed=seed
            ).fit(cur)
            self._pq_model = model
            self._pq_codes = model.encode(cur)
            self.index = model
        elif self.index_type == "sq":
            model = ScalarQuantizer(bits=self.sq_bits).fit(cur)
            self._sq_model = model
            self._sq_codes = model.encode(cur)
            self.index = model
        elif self.index_type == "nsg":
            from faiss_spark.operators.nsg import NSGIndex

            self.index = NSGIndex.build(cur, R=self.nsg_r)
        elif self.index_type == "lattice":
            from faiss_spark.operators.lattice import LatticeIndex

            idx = LatticeIndex(
                nsq=self.lat_nsq, scale_nbit=self.lat_scale_nbit,
                r2=self.lat_r2,
            ).fit(cur)
            self._lat_codes = idx.sa_encode(cur)
            self.index = idx
        return self

    def search(self, queries: DataFrame, k: int, nprobe: int = 8,
               qid_col: str = "qid", qvec_col: str = "vec") -> DataFrame:
        from faiss_spark.operators.knn import knn

        q = queries.select(
            F.col(qid_col).cast("bigint").alias("qid"), F.col(qvec_col).alias("vec")
        )
        for kind, arg in self.sql_transforms:
            if kind == "l2norm":
                q = q.select("qid", normalize_expr(F.col("vec")).alias("vec"))
            else:
                q = q.select("qid", remap_dimensions_expr(F.col("vec"), arg).alias("vec"))
        if self.pipeline:
            q = self.pipeline.apply(q, id_col="qid")
        k_cand = k * self.k_factor if self.refine_flat else k
        if self.index_type == "flat":
            res = knn(self._transformed, q, k_cand, metric=self.metric, qid_col="qid")
        elif self.index_type in ("ivfflat", "ivfpq", "ivfsq", "ivfrq", "ivfrqfs"):
            res = self.index.search(q, k_cand, nprobe=nprobe, qid_col="qid")
            if self.flat_dedup:
                # IndexIVFFlatDedup: duplicated ids materialize at result
                # time (reference IndexIVFFlatDedup.h:30 instances map)
                res = res.join(self._dedup_ids, "id").select(
                    "qid", F.explode("ids").alias("id"), "dist", "rank"
                )
        elif self.index_type == "pq":
            if self.fastscan:
                from faiss_spark.operators.fastscan import pq_fastscan_search

                res = pq_fastscan_search(
                    self._pq_model, self._pq_codes, q, k_cand, qid_col="qid"
                )
            else:
                res = self._pq_model.adc_search(
                    self._pq_codes, q, k_cand, qid_col="qid"
                )
        elif self.index_type == "rq":
            decoded = self._rq_model.decode(self._rq_codes)
            res = knn(decoded, q, k_cand, metric=self.metric, qid_col="qid")
        elif self.index_type == "rqfs":
            from faiss_spark.operators.fastscan import aq_fastscan_search

            res = aq_fastscan_search(
                self._aqfs_model, self._aqfs_codes, q, k_cand, qid_col="qid"
            )
        elif self.index_type == "nsg":
            res = self.index.search(
                q, k_cand, search_L=max(32, 2 * k_cand), qid_col="qid"
            )
        elif self.index_type == "lattice":
            # reference IndexLattice.search throws; here the codec searches
            # like the other full-table codecs: refine-on-decode
            decoded = self.index.sa_decode(self._lat_codes)
            res = knn(decoded, q, k_cand, metric=self.metric, qid_col="qid")
        else:
            # sq: decode + exact scan (SQ is a codec, search = refine on decode)
            decoded = self._sq_model.decode(self._sq_codes)
            res = knn(decoded, q, k_cand, metric=self.metric, qid_col="qid")
        if self.refine_flat:
            from faiss_spark.operators.refine import refine_search

            res = refine_search(res, self._transformed, q, k, metric=self.metric)
        return res


def index_factory(description: str, metric: str = "l2") -> IndexPlan:
    """Parse a faiss factory string (reference index_factory.cpp:192-804
    grammar, round-1 subset) into an IndexPlan."""
    plan = IndexPlan(metric=metric)
    tokens = [t.strip() for t in description.split(",") if t.strip()]
    i = 0
    # leading transforms
    while i < len(tokens):
        tok = tokens[i]
        if tok == "L2norm":
            plan.sql_transforms.append(("l2norm", None))
            i += 1
            continue
        if tok in ("IDMap", "IDMap2"):
            # id wrappers are free here — ids are a column everywhere
            # (reference index_factory.cpp:741-751)
            i += 1
            continue
        m = re.match(r"^Pad(\d+)$", tok)
        if m:
            plan.sql_transforms.append(("pad", int(m.group(1))))
            i += 1
            continue
        matched = False
        for rx, make in _TRANSFORM_RES:
            m = rx.match(tok)
            if m:
                plan.transforms.append(make(m))
                i += 1
                matched = True
                break
        if not matched:
            break
    if i >= len(tokens):
        raise ValueError(f"factory string {description!r} has no index stage")
    tok = tokens[i]
    m = re.match(r"^IMI2x(\d+)$", tok)
    if m:
        # MultiIndexQuantizer coarse (reference index_factory.cpp:241-289
        # "IMI2x<b>" → nlist = 2^(2b) product cells); Flat codes only
        plan.coarse = "imi"
        plan.coarse_nbits = int(m.group(1))
        plan.nlist = 1 << (2 * plan.coarse_nbits)
        i += 1
        if i >= len(tokens) or tokens[i] != "Flat":
            raise ValueError(f"{tok!r} supports Flat codes only")
        plan.index_type = "ivfflat"
        i += 1
        if i < len(tokens) and tokens[i] == "RFlat":
            plan.refine_flat = True
            i += 1
        if i != len(tokens):
            raise ValueError(f"trailing tokens {tokens[i:]} in {description!r}")
        return plan
    m = re.match(r"^IVF(\d+)(?:\((RCQ|LSQ)(\d+)x(\d+)\))?$", tok)
    if m:
        plan.nlist = int(m.group(1))
        if m.group(2):
            plan.coarse = m.group(2).lower()
            plan.coarse_m = int(m.group(3))
            plan.coarse_nbits = int(m.group(4))
            if plan.nlist != 1 << (plan.coarse_m * plan.coarse_nbits):
                raise ValueError(
                    f"{tok!r}: nlist {plan.nlist} != 2^(M·nbits) = "
                    f"{1 << (plan.coarse_m * plan.coarse_nbits)}"
                )
        i += 1
        if i >= len(tokens):
            raise ValueError(f"IVF{plan.nlist} needs a code stage (Flat/PQm/SQ8)")
        code = tokens[i]
        if plan.coarse is not None and code != "Flat":
            raise ValueError(
                f"additive coarse quantizer supports Flat codes only, got {code!r}"
            )
        if code == "FlatDedup":
            # IndexIVFFlatDedup (reference faiss/IndexIVFFlatDedup.h:21):
            # store one entry per distinct vector, explode ids at result
            plan.index_type = "ivfflat"
            plan.flat_dedup = True
        elif code == "Flat":
            plan.index_type = "ivfflat"
        elif re.match(r"^PQ(\d+)x4fs(_\d+)?$", code):
            # IVF<n>,PQ<M>x4fs[_<bbs>] (reference index_factory.cpp
            # fast-scan suffix) — 4-bit codes, quantized-LUT search
            pm = re.match(r"^PQ(\d+)x4fs(?:_(\d+))?$", code)
            plan.index_type = "ivfpq"
            plan.pq_m = int(pm.group(1))
            plan.pq_nbits = 4
            plan.fastscan = True
            if pm.group(2):
                plan.bbs = int(pm.group(2))
        elif re.match(r"^PQ(\d+)(x\d+)?$", code):
            pm = re.match(r"^PQ(\d+)(?:x(\d+))?$", code)
            plan.index_type = "ivfpq"
            plan.pq_m = int(pm.group(1))
            if pm.group(2):
                plan.pq_nbits = int(pm.group(2))
        elif re.match(r"^SQ(4|6|8)$", code):
            plan.index_type = "ivfsq"
            plan.sq_bits = int(code[2:])
        elif re.match(r"^RQ(\d+)x4fs(_\d+)?$", code):
            # IVF<n>,RQ<M>x4fs[_<bbs>] — IVF AQ fast-scan
            rm = re.match(r"^RQ(\d+)x4fs(?:_(\d+))?$", code)
            plan.index_type = "ivfrqfs"
            plan.rq_m = int(rm.group(1))
            plan.fastscan = True
            if rm.group(2):
                plan.bbs = int(rm.group(2))
        elif re.match(r"^RQ(\d+)$", code):
            plan.index_type = "ivfrq"
            plan.rq_m = int(code[2:])
        else:
            raise ValueError(f"unsupported IVF code stage {code!r}")
        i += 1
    elif tok == "Flat":
        plan.index_type = "flat"
        i += 1
    elif re.match(r"^PQ(\d+)x4fs(_\d+)?$", tok):
        pm = re.match(r"^PQ(\d+)x4fs(?:_(\d+))?$", tok)
        plan.index_type = "pq"
        plan.pq_m = int(pm.group(1))
        plan.pq_nbits = 4
        plan.fastscan = True
        if pm.group(2):
            plan.bbs = int(pm.group(2))
        i += 1
    elif re.match(r"^PQ(\d+)(x\d+)?$", tok):
        pm = re.match(r"^PQ(\d+)(?:x(\d+))?$", tok)
        plan.index_type = "pq"
        plan.pq_m = int(pm.group(1))
        if pm.group(2):
            plan.pq_nbits = int(pm.group(2))
        i += 1
    elif re.match(r"^SQ(4|6|8|fp16)$", tok):
        plan.index_type = "sq"
        plan.sq_bits = {"4": 4, "6": 6, "8": 8, "fp16": 16}[tok[2:]]
        i += 1
    elif re.match(r"^RQ(\d+)x4fs(_\d+)?$", tok):
        # RQ<M>x4fs[_<bbs>] — AQ fast-scan (ST_norm_rq2x4 semantics)
        rm = re.match(r"^RQ(\d+)x4fs(?:_(\d+))?$", tok)
        plan.index_type = "rqfs"
        plan.rq_m = int(rm.group(1))
        plan.fastscan = True
        if rm.group(2):
            plan.bbs = int(rm.group(2))
        i += 1
    elif re.match(r"^RQ(\d+)$", tok):
        plan.index_type = "rq"
        plan.rq_m = int(tok[2:])
        i += 1
    elif re.match(r"^NSG(\d+)?$", tok):
        nm = re.match(r"^NSG(\d+)?$", tok)
        plan.index_type = "nsg"
        plan.nsg_r = int(nm.group(1)) if nm.group(1) else 32
        i += 1
        if i < len(tokens) and tokens[i] == "Flat":
            i += 1  # "NSG32,Flat" — Flat storage is the only storage here
    elif re.match(r"^ZnLattice(\d+)x(\d+)_(\d+)$", tok):
        lm = re.match(r"^ZnLattice(\d+)x(\d+)_(\d+)$", tok)
        plan.index_type = "lattice"
        plan.lat_nsq = int(lm.group(1))
        plan.lat_r2 = int(lm.group(2))
        plan.lat_scale_nbit = int(lm.group(3))
        i += 1
    else:
        raise ValueError(f"unsupported factory token {tok!r} in {description!r}")
    if i < len(tokens) and tokens[i] == "RFlat":
        plan.refine_flat = True
        i += 1
    if i != len(tokens):
        raise ValueError(f"trailing tokens {tokens[i:]} in {description!r}")
    return plan


def reverse_index_factory(plan: IndexPlan) -> str:
    """IndexPlan → factory string (reference contrib/factory_tools.py:76)."""
    parts = []
    for kind, arg in plan.sql_transforms:
        parts.append("L2norm" if kind == "l2norm" else f"Pad{arg}")
    for t in plan.transforms:
        if isinstance(t, PCAMatrix):
            prefix = "PCAW" if t.eigen_power else ("PCAR" if t.random_rotation else "PCA")
            parts.append(f"{prefix}{t.d_out}")
        elif isinstance(t, OPQMatrix):
            parts.append(f"OPQ{t.M}")
        elif isinstance(t, RandomRotation):
            parts.append("RR")
        elif isinstance(t, ITQTransform):
            parts.append("ITQ")
    if plan.index_type == "flat":
        parts.append("Flat")
    elif plan.index_type == "ivfflat":
        if plan.coarse == "imi":
            parts.append(f"IMI2x{plan.coarse_nbits}")
        elif plan.coarse is not None:
            parts.append(
                f"IVF{plan.nlist}({plan.coarse.upper()}"
                f"{plan.coarse_m}x{plan.coarse_nbits})"
            )
        else:
            parts.append(f"IVF{plan.nlist}")
        parts.append("FlatDedup" if plan.flat_dedup else "Flat")
    elif plan.index_type == "ivfpq":
        parts.append(f"IVF{plan.nlist}")
        if plan.fastscan:
            parts.append(
                f"PQ{plan.pq_m}x4fs" + (f"_{plan.bbs}" if plan.bbs != 32 else "")
            )
        else:
            parts.append(
                f"PQ{plan.pq_m}"
                + (f"x{plan.pq_nbits}" if plan.pq_nbits != 8 else "")
            )
    elif plan.index_type == "ivfsq":
        parts.append(f"IVF{plan.nlist}")
        parts.append(f"SQ{plan.sq_bits}")
    elif plan.index_type == "ivfrq":
        parts.append(f"IVF{plan.nlist}")
        parts.append(f"RQ{plan.rq_m}")
    elif plan.index_type == "ivfrqfs":
        parts.append(f"IVF{plan.nlist}")
        parts.append(
            f"RQ{plan.rq_m}x4fs" + (f"_{plan.bbs}" if plan.bbs != 32 else "")
        )
    elif plan.index_type == "pq":
        if plan.fastscan:
            parts.append(
                f"PQ{plan.pq_m}x4fs" + (f"_{plan.bbs}" if plan.bbs != 32 else "")
            )
        else:
            parts.append(
                f"PQ{plan.pq_m}"
                + (f"x{plan.pq_nbits}" if plan.pq_nbits != 8 else "")
            )
    elif plan.index_type == "sq":
        parts.append({4: "SQ4", 6: "SQ6", 8: "SQ8", 16: "SQfp16"}[plan.sq_bits])
    elif plan.index_type == "rq":
        parts.append(f"RQ{plan.rq_m}")
    elif plan.index_type == "rqfs":
        parts.append(
            f"RQ{plan.rq_m}x4fs" + (f"_{plan.bbs}" if plan.bbs != 32 else "")
        )
    elif plan.index_type == "nsg":
        parts.append(f"NSG{plan.nsg_r}")
    elif plan.index_type == "lattice":
        parts.append(
            f"ZnLattice{plan.lat_nsq}x{plan.lat_r2}_{plan.lat_scale_nbit}"
        )
    if plan.refine_flat:
        parts.append("RFlat")
    return ",".join(parts)


def get_code_size(d: int, plan: IndexPlan) -> int:
    """Bytes per encoded vector for a parsed plan (reference
    contrib/factory_tools.py:10-46 get_code_size). Flat forms store raw
    float32; SQ packs d values at sq_bits each; PQ/RQ store one byte per
    sub-quantizer (8-bit codes). Transforms that change dimensionality
    (PCA/OPQ/Pad) apply first."""
    for t in plan.transforms:
        if isinstance(t, PCAMatrix):
            d = t.d_out
    for kind, arg in plan.sql_transforms:
        if kind == "pad":
            d = max(d, arg)
    if plan.index_type in ("flat", "ivfflat"):
        return d * 4
    if plan.index_type in ("pq", "ivfpq"):
        return plan.pq_m
    if plan.index_type in ("rq", "ivfrq"):
        return plan.rq_m
    if plan.index_type in ("sq", "ivfsq"):
        return (d * plan.sq_bits + 7) // 8
    if plan.index_type == "lattice":
        from faiss_spark.operators.lattice import ZnSphereCodec

        nv = ZnSphereCodec(d // plan.lat_nsq, plan.lat_r2).nv
        lattice_nbit = max(1, (int(nv) - 1).bit_length())
        total = (lattice_nbit + plan.lat_scale_nbit) * plan.lat_nsq
        return (total + 7) // 8
    raise ValueError(f"unknown index_type {plan.index_type!r}")


# ----------------------------------------------------------- binary factory


@dataclass
class BinaryIndexPlan:
    """Parsed binary factory string (reference index_binary_factory,
    faiss/index_factory.cpp:895-915: BFlat | BIVF<nlist> | BHash<b>).
    Operates on binarized code tables (id, code array<bigint>) — produce
    them with operators/binary.binarize or binarize_rotated."""

    kind: str  # "bflat" | "bivf" | "bhash" | "bmultihash"
    nlist: int | None = None
    hash_b: int | None = None
    nhash: int | None = None

    index: object | None = None
    _codes = None

    def fit(
        self, codes: DataFrame, nbits: int, id_col: str = "id",
        code_col: str = "code", seed: int = 1234,
    ) -> "BinaryIndexPlan":
        from faiss_spark.operators.binary import BinaryHashIndex, BinaryIVFIndex

        if self.kind == "bflat":
            self._codes = codes.select(
                F.col(id_col).cast("bigint").alias("id"),
                F.col(code_col).alias("code"),
            )
        elif self.kind == "bivf":
            self.index = BinaryIVFIndex.train(
                codes, nlist=self.nlist, nbits=nbits, code_col=code_col, seed=seed
            ).add(codes, id_col=id_col, code_col=code_col)
        elif self.kind == "bmultihash":
            from faiss_spark.operators.binary import BinaryMultiHashIndex

            self.index = BinaryMultiHashIndex(self.nhash, self.hash_b).add(
                codes, id_col=id_col, code_col=code_col
            )
        else:
            self.index = BinaryHashIndex(self.hash_b).add(
                codes, id_col=id_col, code_col=code_col
            )
        return self

    def search(
        self, qcodes: DataFrame, k: int, nprobe: int = 1, radius: int = 1,
        qid_col: str = "qid", qcode_col: str = "qcode",
    ) -> DataFrame:
        from faiss_spark.operators.binary import hamming_knn

        if self.kind == "bflat":
            return hamming_knn(
                self._codes, qcodes.select(
                    F.col(qid_col).cast("bigint").alias("qid"),
                    F.col(qcode_col).alias("qcode"),
                ), k,
            )
        if self.kind == "bivf":
            return self.index.search(
                qcodes, k, nprobe=nprobe, qid_col=qid_col, qcode_col=qcode_col
            )
        return self.index.search(
            qcodes, k, radius=radius, qid_col=qid_col, qcode_col=qcode_col
        )


def index_binary_factory(description: str) -> BinaryIndexPlan:
    """Binary factory strings (reference faiss/index_factory.cpp:895)."""
    desc = description.strip()
    if desc == "BFlat":
        return BinaryIndexPlan(kind="bflat")
    m = re.match(r"^BIVF(\d+)$", desc)
    if m:
        return BinaryIndexPlan(kind="bivf", nlist=int(m.group(1)))
    m = re.match(r"^BHash(\d+)x(\d+)$", desc)
    if m:
        # IndexBinaryMultiHash (reference index_factory.cpp:911)
        return BinaryIndexPlan(
            kind="bmultihash", nhash=int(m.group(1)), hash_b=int(m.group(2))
        )
    m = re.match(r"^BHash(\d+)$", desc)
    if m:
        return BinaryIndexPlan(kind="bhash", hash_b=int(m.group(1)))
    raise ValueError(f"unsupported binary factory string {description!r}")


def reverse_index_binary_factory(plan: BinaryIndexPlan) -> str:
    if plan.kind == "bflat":
        return "BFlat"
    if plan.kind == "bivf":
        return f"BIVF{plan.nlist}"
    if plan.kind == "bmultihash":
        return f"BHash{plan.nhash}x{plan.hash_b}"
    return f"BHash{plan.hash_b}"
