"""Alternate-format ingestion: newline-delimited JSON (the lingua franca
of web-scale text corpora — Common Crawl derivatives, chat logs, API
dumps ship as JSONL long before anyone parquet-izes them).

``docs_from_jsonl`` proves the engine ingests NDJSON natively
(``ray.data.read_json`` → pyarrow.json, zero-copy Arrow blocks, same
downstream vectorized kernels as the parquet path) and that values
round-trip: the query re-derives per-doc token stats from the JSONL and
the DuckDB oracle reads the SAME file with ``read_json``.

The JSONL fixture is converted once per sf_dir from documents.parquet —
test plumbing only (a real deployment reads the JSONL it was handed); a
``_COMPLETE`` marker keeps the conversion idempotent, mirroring
transcripts.ensure_corpus.
"""

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.csv as pacsv

import ray.data

from .common import sf_from_dir, table_path

__all__ = ['docs_from_jsonl', 'ensure_jsonl', 'jsonl_oracle_sql',
           'docs_from_csv', 'ensure_csv', 'csv_oracle_sql']

_JSONL_ROOT = '/tmp/graft_jsonl'
_VERSION = 'v1'


def ensure_jsonl(sf_dir):
    """documents.parquet → documents.jsonl, once per (sf, version)."""
    import pyarrow.parquet as pq
    out_dir = os.path.join(_JSONL_ROOT,
                           'sf%s-%s' % (sf_from_dir(sf_dir), _VERSION))
    marker = os.path.join(out_dir, '_COMPLETE')
    path = os.path.join(out_dir, 'documents.jsonl')
    if os.path.exists(marker):
        return path
    os.makedirs(out_dir, exist_ok=True)
    tbl = pq.read_table(table_path(sf_dir, 'documents'))
    tmp = path + '.tmp'
    with open(tmp, 'w', encoding='utf-8') as f:
        for row in tbl.to_pylist():
            f.write(json.dumps(row, ensure_ascii=False, sort_keys=True))
            f.write('\n')
    os.replace(tmp, path)
    with open(marker, 'w') as f:
        f.write(_VERSION)
    return path


def docs_from_jsonl(sf_dir):
    """Per-doc token stats computed from the NDJSON corpus — the parquet
    path's doc_token_stats shape over a different source format (JSONL
    splits into Arrow blocks the same way; at 100 TB, shard the corpus
    into many .jsonl files so the read parallelizes per file)."""
    path = ensure_jsonl(sf_dir)

    def stats(batch: pa.Table) -> pa.Table:
        text = batch.column('text')
        n_tokens = pc.cast(pc.count_substring_regex(text, pattern=r'\S+'),
                           pa.int64())
        return pa.table({
            'doc_id': batch.column('doc_id'),
            'lang': batch.column('lang'),
            'n_chars': batch.column('n_chars'),
            'n_tokens': n_tokens,
        })

    ds = ray.data.read_json(path)
    return ds.map_batches(stats, batch_format='pyarrow',
                          zero_copy_batch=True)


def jsonl_oracle_sql(sf_dir=None):
    """DuckDB reads the SAME JSONL file — format parity, value parity."""
    from .oracles import _oracle_sf_dir
    path = ensure_jsonl(sf_dir or _oracle_sf_dir())
    return r"""
SELECT doc_id, lang, n_chars,
       len(regexp_extract_all(text, '\S+'))::BIGINT AS n_tokens
FROM read_json('{path}', format='newline_delimited')
""".format(path=path)


_CSV_ROOT = '/tmp/graft_csv'


def ensure_csv(sf_dir):
    """documents.parquet → documents.csv (RFC-4180 quoting via pyarrow's
    csv writer), once per (sf, version)."""
    import pyarrow.csv as pacsv
    import pyarrow.parquet as pq
    out_dir = os.path.join(_CSV_ROOT,
                           'sf%s-%s' % (sf_from_dir(sf_dir), _VERSION))
    marker = os.path.join(out_dir, '_COMPLETE')
    path = os.path.join(out_dir, 'documents.csv')
    if os.path.exists(marker):
        return path
    os.makedirs(out_dir, exist_ok=True)
    tbl = pq.read_table(table_path(sf_dir, 'documents'))
    tmp = path + '.tmp'
    pacsv.write_csv(tbl, tmp)
    os.replace(tmp, path)
    with open(marker, 'w') as f:
        f.write(_VERSION)
    return path


def docs_from_csv(sf_dir):
    """Per-doc quality-ish stats computed from the CSV corpus — proves
    the delimited-text source path (``ray.data.read_csv`` → pyarrow.csv
    blocks, same vectorized kernels).  At 100 TB, shard into many .csv
    files (or .csv.gz — pyarrow decompresses transparently) so the read
    parallelizes per file."""
    path = ensure_csv(sf_dir)

    def stats(batch: pa.Table) -> pa.Table:
        text = batch.column('text')
        return pa.table({
            'doc_id': batch.column('doc_id'),
            'source': batch.column('source'),
            'n_tokens': pc.cast(
                pc.count_substring_regex(text, pattern=r'\S+'), pa.int64()),
            'n_chars_calc': pc.cast(pc.utf8_length(text), pa.int64()),
        })

    # newlines_in_values: RFC-4180 permits quoted embedded newlines
    # (ensure_csv writes them quoted; DuckDB's reader accepts them by
    # default) — without this the pyarrow parser splits mid-record.
    # Cost: disables the parallel chunker WITHIN one file, so at scale
    # shard into many files (see docstring) to keep the read parallel.
    ds = ray.data.read_csv(
        path, parse_options=pacsv.ParseOptions(newlines_in_values=True))
    return ds.map_batches(stats, batch_format='pyarrow',
                          zero_copy_batch=True)


def csv_oracle_sql(sf_dir=None):
    """DuckDB reads the SAME CSV file — format parity, value parity."""
    from .oracles import _oracle_sf_dir
    path = ensure_csv(sf_dir or _oracle_sf_dir())
    return r"""
SELECT doc_id, source,
       len(regexp_extract_all(text, '\S+'))::BIGINT AS n_tokens,
       length(text)::BIGINT AS n_chars_calc
FROM read_csv('{path}', header=true, allow_quoted_nulls=false)
""".format(path=path)
