#!/usr/bin/env python3
"""Independent trainer for the committed embedding-quality head
(driver-side tooling, the gen_bpe_train_fixture.py pattern): fits a
plain-numpy logistic regression over the sf0.001 embeddings table
against the binary target `label <= 4` (the synthetic stand-in for an
LLM-annotated "educational" flag, the FineWeb-Edu recipe), then prints
the Scala literals for graft.operators.EmbedQuality plus the expected
in-sample accuracy the spec pins.

Honesty note (document, do not hide): the synthetic embeddings carry
only a whisper of label structure (within-label mean cosine ~0.02 vs
~0.00 across), so the head is in-sample-learnable (~0.65) but does NOT
generalize to other SF dirs (~0.50 at sf0.01). The engine artifact is
the MECHANISM — committed-weights linear head, distributed scoring,
oracle-exact replay — exactly as it would run with a real trained head
over real embeddings; the committed weights are the fixture.

Hyperparameters are FIXED (lr=0.5, iters=300, l2=1e-3, float64,
zero init) so the weights are reproducible bit-for-bit; they are then
rounded to 6dp, and BOTH engines parse the same 6dp decimal literals,
so scoring replays exactly.
"""
import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"
LR, ITERS, L2 = 0.5, 300, 1e-3

d = pd.read_parquet(f"{SF}/embeddings.parquet").sort_values("vec_id")
X = np.stack(d.embedding.values).astype(np.float64)
y = (d.label.values <= 4).astype(np.float64)

w = np.zeros(X.shape[1])
b = 0.0
for _ in range(ITERS):
    p = 1.0 / (1.0 + np.exp(-(X @ w + b)))
    g = p - y
    w -= LR * (X.T @ g / len(y) + L2 * w)
    b -= LR * g.mean()

w6 = np.round(w, 6)
b6 = round(b, 6)
# accuracy computed off the ROUNDED weights and 6dp-rounded score —
# the exact quantity the Spark query and the DuckDB oracle both emit
p6 = np.round(1.0 / (1.0 + np.exp(-(X @ w6 + b6))), 6)
acc = float(((p6 >= 0.5) == (y == 1)).mean())
print(f"// trained by scripts/gen_embed_quality_fixture.py on {SF}")
print(f"// in-sample accuracy (6dp-rounded score, >=0.5): {acc}")
print(f"  val bias: Double = {b6}")
rows = [", ".join(f"{v}" for v in w6[i:i + 6]) for i in range(0, 64, 6)]
print("  val weights: Array[Double] = Array(")
print("    " + ",\n    ".join(rows) + ")")
