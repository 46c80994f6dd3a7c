"""End-to-end tour of kmerutils_tpu on a small FASTA/FASTQ.

Covers the capability surface a kmerutils (Rust) user would reach for:
exact counting with coordinates, per-read ProbMinHash signatures + Jaccard,
whole-collection HLL sketch, neighbor search, sliding-window anchors.

Run:  python examples/pipeline_demo.py [file.fastq]
(without an argument it synthesizes 200 overlapping reads)
"""

import sys
import tempfile

import numpy as np

import kmerutils_tpu  # noqa: F401  (x64 + compilation cache)
from kmerutils_tpu.io import fastx
from kmerutils_tpu.count import exact
from kmerutils_tpu.sketch.jaccard import Sketcher, jaccard_one_vs_many
from kmerutils_tpu.sketch.params import SeqSketcherParams, SketchAlgo, DataType
from kmerutils_tpu.ann import brute_force_neighbors
from kmerutils_tpu.anchor import AnchorsGeneratorParameters, compute_anchors


def synthesize(path, n=200, L=800):
    rng = np.random.default_rng(0)
    bases = np.array(list("ACGT"))
    genome = "".join(bases[rng.integers(0, 4, 20_000)])
    starts = rng.integers(0, len(genome) - L, n)
    fastx.write_fastq(path, [genome[s : s + L] for s in starts])


def main():
    if len(sys.argv) > 1:
        path = sys.argv[1]
    else:
        path = tempfile.mktemp(suffix=".fastq")
        synthesize(path)
        print(f"synthesized 200 overlapping reads -> {path}")

    batch = fastx.load_all(path)
    print(f"loaded {batch.n_reads} reads, max_len {int(np.asarray(batch.lengths).max())}")

    # --- exact counting (parsefastq --count role) ---------------------------
    kc = exact.count_batch(batch, k=16)
    keys, counts = exact.compact(kc)
    print(f"16-mers: {len(keys)} distinct, {int(kc.n_unique)} unique, "
          f"max count {counts.max()}")

    # --- per-read ProbMinHash signatures + Jaccard --------------------------
    params = SeqSketcherParams(kmer_size=11, sketch_size=256,
                               algo=SketchAlgo.PROB3A, data_t=DataType.DNA)
    sk = Sketcher(params=params)
    sigs = np.asarray(sk.sketch_batch(batch))
    j01 = float(np.asarray(sk.jaccard(sigs[0], sigs[1])))
    print(f"ProbMinHash J(read0, read1) ~ {j01:.3f}")

    # --- one-vs-many driver (jaccard_index_probminhash3a role) --------------
    ja = np.asarray(jaccard_one_vs_many(
        fastx.load_all(path), batch, params))[:5]
    print("read0 vs first 5 reads:", np.round(ja, 3))

    # --- neighbor search over signatures (hnsw export role) -----------------
    nn, sim = brute_force_neighbors(sigs, nbng=3)
    print(f"read0 neighbors: {nn[0].tolist()} (similarity {np.round(sim[0], 3).tolist()})")

    # --- whole-collection mergeable sketch (HLL) -----------------------------
    hll = Sketcher(SeqSketcherParams(kmer_size=16, sketch_size=512,
                                     algo=SketchAlgo.HLL, data_t=DataType.DNA))
    regs = hll.sketch_collection(batch)
    from kmerutils_tpu.sketch import setsketch
    card = float(np.asarray(setsketch.cardinality(
        regs, hll.setsketch_params or setsketch.SetSketchParams(m=512))))
    print(f"HLL distinct-16mer estimate {card:.0f} (exact {len(keys)})")

    # --- sliding-window anchors (anchor.rs role) -----------------------------
    ap = AnchorsGeneratorParameters(fasta_name=path, window=200, nbkmer=8,
                                    kmer_size=11, overlap=50)
    anchors = compute_anchors(batch, ap)
    print(f"{len(anchors)} window anchors; first: read {anchors[0].readnum} "
          f"pos {anchors[0].slicepos} minhash {anchors[0].minhash[:2]}...")


if __name__ == "__main__":
    main()
