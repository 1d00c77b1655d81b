"""Batched MODEL-INFERENCE stage: a document quality model scored over
the corpus — the shape every learned-filter pass (fastText quality
classifiers, perplexity filters, reward models) takes on Ray Data:
weights load ONCE per worker from a ``ray.put`` broadcast, the batch is
scored in one vectorized pass, output is one score row per document.
Swapping the toy linear model for a real forward pass changes ONLY the
``__call__`` body; the plumbing — broadcast, task pool, batch size,
schema — is what this stage pins down (cf. the codec seam in
:mod:`engine.ops.multimodal`, which stubs the library and keeps the
plumbing real).

EXACT-parity design (the "model" must be auditable by the DuckDB
oracle): features are integer counts (tokens, chars, digits), the
logit is an INTEGER dot product, and the activation is the softsign
``z / (T + |z|)`` rather than a sigmoid — one IEEE float64 division of
two int64-exact operands, identical on both sides, no exp() to drift
and no rounding step at all.  ``keep`` is the decision the pipeline
acts on (score > 0 ⇔ z > 0 — integer compare).

The weight vector is fixed ("trained" offline); the oracle SQL is
GENERATED from the same constants so the two cannot drift.
"""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from .common import BroadcastLookup, pool, read_table
from .textstats import DIGIT_RE, TOKEN_RE

__all__ = ['doc_model_score', 'model_score_oracle_sql', 'MODEL_WEIGHTS']

# The "trained" model: integer weights over integer features, softsign
# temperature T.  z = w·x + b;  score = z / (T + |z|);  keep = z > 0.
MODEL_WEIGHTS = {
    'w_tokens': 50,
    'w_chars': -1,
    'w_digits': 20,
    'bias': -300,
    'temp': 1000,
}


class _Scorer(BroadcastLookup):
    """Weights fetched once per actor (``BroadcastLookup.__init__``);
    each call is one vectorized feature pass + integer dot product."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        w = self.state
        text = batch.column('text')
        n_tokens = pc.cast(pc.count_substring_regex(
            text, pattern=TOKEN_RE), pa.int64()).to_numpy()
        n_digits = pc.cast(pc.count_substring_regex(
            text, pattern=DIGIT_RE), pa.int64()).to_numpy()
        n_chars = batch.column('n_chars').to_numpy()
        z = (w['w_tokens'] * n_tokens + w['w_chars'] * n_chars
             + w['w_digits'] * n_digits + w['bias'])
        score = z.astype(np.float64) / (float(w['temp'])
                                        + np.abs(z).astype(np.float64))
        return pa.table({
            'doc_id': batch.column('doc_id'),
            'z_num': pa.array(z, pa.int64()),
            'model_score': pa.array(score, pa.float64()),
            'keep': pa.array(z > 0, pa.bool_()),
        })


def doc_model_score(sf_dir):
    """Score every document with the broadcast quality model (module
    docstring).  Embarrassingly parallel — no shuffle; an actor pool
    sized to the cluster so a real model's load cost amortizes across
    batches."""
    ref = ray.put(MODEL_WEIGHTS)
    return read_table(sf_dir, 'documents',
                      columns=['doc_id', 'text', 'n_chars'],
                      min_blocks=pool()[1]) \
        .map_batches(_Scorer, fn_constructor_args=(ref,),
                     concurrency=pool(), batch_format='pyarrow',
                     zero_copy_batch=True)


def model_score_oracle_sql(weights=None):
    """Oracle generated from the SAME weight constants: integer logit,
    one float64 division (both operands int64-exact < 2^53)."""
    w = weights or MODEL_WEIGHTS
    return r"""
WITH f AS (SELECT doc_id,
                  CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT)
                      AS n_tokens,
                  CAST(length(regexp_extract_all(text, '[0-9]')) AS BIGINT)
                      AS n_digits,
                  n_chars
           FROM documents),
z AS (SELECT doc_id,
             {wt} * n_tokens + {wc} * n_chars + {wd} * n_digits + {b}
                 AS z_num
      FROM f)
SELECT doc_id, z_num,
       CAST(z_num AS DOUBLE) / ({t} + CAST(abs(z_num) AS DOUBLE))
           AS model_score,
       z_num > 0 AS keep
FROM z
""".format(wt=w['w_tokens'], wc=w['w_chars'], wd=w['w_digits'],
           b=w['bias'], t='%d.0' % w['temp'])
