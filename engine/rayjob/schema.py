"""Arrow schemas for the transcripts pipeline (SURVEY.md §1.2)."""

import pyarrow as pa

# Input: BASELINE.json `input_hint` shape
TRANSCRIPTS_SCHEMA = pa.schema([
    ('conv_id', pa.string()),
    ('turn_idx', pa.int32()),
    ('role', pa.string()),
    ('text', pa.string()),      # latin-1-decoded PDF payload
    ('tool', pa.string()),
    ('ts', pa.timestamp('us')),
])

# Output of the extraction stage
TURNS_OUT_SCHEMA = pa.schema([
    ('conv_id', pa.string()),
    ('turn_idx', pa.int32()),
    ('text', pa.string()),      # extracted per-turn text (byte-equal to reference)
    ('n_spans', pa.int32()),
    ('n_pages', pa.int32()),
    ('decode_ok', pa.bool_()),
    ('error', pa.string()),
])
