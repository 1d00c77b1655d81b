"""Multimodal columns: opaque ``binary`` payloads + typed metadata.

Two decode seams, both real and tested: ``fake=True`` parses the
deterministic MMV1 container below; ``fake=False`` decodes actual
IMAGE FILES — via Pillow when installed, else the bundled pure-Python
PNG codec (:mod:`engine.ops.pngcodec` — 8-bit non-interlaced
gray/LA/RGB/RGBA; payloads outside that profile decode_ok=False, never
fabricated).  Only the VIDEO frame-sampling real path stays an honest
``NotImplementedError`` (it needs ffmpeg, which no pure fallback can
replace).  Everything Ray-side is identical across seams: the
binary-column schema, actor-pool ``map_batches`` stage shape,
small-batch sizing for large payloads, and the output layout.

Payload convention (deterministic synthetic "images" derived from the
documents table): 16-byte header ``MMV1 | width:u32 | height:u32 | ch:u32``
followed by ``width*height*ch`` content bytes.
"""

import io
import os

import numpy as np
import pyarrow as pa

import ray.data

from .common import round_half_up, table_path, read_table, pool


def real_codecs_requested():
    """Env knob for real-codec mode: ``GRAFT_MM_REAL_CODECS=1`` flips
    the pipeline entry points to ``fake=False`` (Pillow, or the pure
    PNG codec when Pillow is absent; the video frame path additionally
    needs ffmpeg and stays stubbed).  Off by default — the synthetic
    corpus payloads are MMV1 containers, not encoded images."""
    return os.environ.get('GRAFT_MM_REAL_CODECS') == '1'


def _try_pil():
    """Pillow's Image module when installed, else the pure-Python PNG
    shim (same ``open`` / ``fromarray`` / ``Resampling.NEAREST``
    surface) — the real-codec seam always has a REAL decoder behind it
    in this container."""
    try:
        from PIL import Image
        return Image
    except ImportError:
        from .pngcodec import PURE_PIL
        return PURE_PIL

__all__ = ['synthesize_media', 'DecodeMedia', 'decode_media_features',
           'ResizeMedia', 'resize_media', 'resized_features',
           'FrameSample', 'sample_frames', 'FrameFeatures', 'frame_features',
           'resized_blob_md5', 'frame_blob_md5',
           'MEDIA_SCHEMA', 'FEATURES_SCHEMA']

_MAGIC = b'MMV1'

MEDIA_SCHEMA = pa.schema([
    ('media_id', pa.int64()),
    ('kind', pa.string()),            # 'image' | 'audio' | 'video'
    ('payload', pa.large_binary()),   # opaque encoded bytes
    ('meta_width', pa.int32()),
    ('meta_height', pa.int32()),
    ('meta_channels', pa.int32()),
])

FEATURES_SCHEMA = pa.schema([
    ('media_id', pa.int64()),
    ('kind', pa.string()),
    ('byte_len', pa.int64()),
    ('width', pa.int32()),
    ('height', pa.int32()),
    ('channels', pa.int32()),
    ('mean_value', pa.float64()),
    ('decode_ok', pa.bool_()),
])


def _fake_payload(doc_id, text):
    """Deterministic fake 'image': dims derived from doc_id, content bytes
    = (code point % 256) of the text's characters, tiled to width*height*ch.
    Code points (not utf-8 bytes) so the DuckDB oracle can recompute the
    body mean from ``ascii(substr(text, i, 1))`` — SQL has no byte-level
    BLOB access."""
    w = 8 + (doc_id % 24)
    h = 8 + ((doc_id // 7) % 16)
    ch = 1 + (doc_id % 3)
    need = w * h * ch
    if text:
        src = np.fromiter(map(ord, text), dtype=np.int64,
                          count=len(text)).astype(np.uint8)   # cp % 256
    else:
        src = np.zeros(1, dtype=np.uint8)
    body = np.tile(src, need // len(src) + 1)[:need].tobytes()
    head = _MAGIC + np.array([w, h, ch], dtype='<u4').tobytes()
    return head + body, w, h, ch


def synthesize_media(sf_dir, encoding='mmv1'):
    """Dataset in MEDIA_SCHEMA synthesized from the documents table
    (stand-in for a real multimodal corpus; deterministic per doc_id).
    ``encoding='png'`` emits the same deterministic pixels as REAL PNG
    files (pure codec) instead of MMV1 containers — the fixture for
    exercising the ``fake=False`` decode path end-to-end."""
    kinds = ('image', 'audio', 'video')
    if encoding not in ('mmv1', 'png'):
        raise ValueError('encoding must be mmv1 or png')

    def make(batch: pa.Table) -> pa.Table:
        from .pngcodec import encode_png
        ids = batch.column('doc_id').to_pylist()
        texts = batch.column('text').to_pylist()
        payloads, ws, hs, cs, kind = [], [], [], [], []
        for did, text in zip(ids, texts):
            p, w, h, ch = _fake_payload(did, text)
            if encoding == 'png':
                body = np.frombuffer(p[16:], np.uint8).reshape(h, w, ch)
                p = encode_png(body[:, :, 0] if ch == 1 else body)
            payloads.append(p)
            ws.append(w)
            hs.append(h)
            cs.append(ch)
            kind.append(kinds[did % 3])
        return pa.table({
            'media_id': pa.array(ids, pa.int64()),
            'kind': pa.array(kind, pa.string()),
            'payload': pa.array(payloads, pa.large_binary()),
            'meta_width': pa.array(ws, pa.int32()),
            'meta_height': pa.array(hs, pa.int32()),
            'meta_channels': pa.array(cs, pa.int32()),
        })

    ds = read_table(sf_dir, 'documents', columns=['doc_id', 'text'],
                    min_blocks=pool()[1])
    return ds.map_batches(make, batch_format='pyarrow', zero_copy_batch=True)


class DecodeMedia:
    """Actor-pool decode stage.

    ``fake=True`` (default in this container) parses the MMV1 header and
    computes cheap numpy features.  ``fake=False`` is the real-codec
    path: the payload is decoded as an encoded image file — Pillow when
    installed, else the pure PNG codec (resolved ONCE per actor in
    ``__init__``); undecodable payloads report decode_ok=False.  Use a
    SMALL ``batch_size`` (payload bytes × batch_size × concurrency must
    fit worker heap).
    """

    def __init__(self, fake=True):
        self.fake = fake
        self._pil = None if fake else _try_pil()

    def _decode(self, payload):
        if not self.fake:
            try:
                img = self._pil.open(io.BytesIO(payload))
                arr = np.asarray(img)
            except Exception:
                return None
            h, w = arr.shape[:2]
            ch = 1 if arr.ndim == 2 else int(arr.shape[2])
            return int(w), int(h), ch, float(arr.mean())
        if payload[:4] != _MAGIC or len(payload) < 16:
            return None
        w, h, ch = np.frombuffer(payload[4:16], dtype='<u4')
        body = np.frombuffer(payload[16:16 + w * h * ch], dtype=np.uint8)
        if body.size != w * h * ch:
            return None
        return int(w), int(h), int(ch), float(body.mean())

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column('media_id')
        kinds = batch.column('kind')
        out = {'byte_len': [], 'width': [], 'height': [], 'channels': [],
               'mean_value': [], 'decode_ok': []}
        for payload in batch.column('payload').to_pylist():
            out['byte_len'].append(len(payload))
            d = self._decode(payload)
            if d is None:
                out['width'].append(0)
                out['height'].append(0)
                out['channels'].append(0)
                out['mean_value'].append(0.0)
                out['decode_ok'].append(False)
            else:
                w, h, ch, mean = d
                out['width'].append(w)
                out['height'].append(h)
                out['channels'].append(ch)
                out['mean_value'].append(float(round_half_up([mean], 4)[0]))
                out['decode_ok'].append(True)
        return pa.table({
            'media_id': ids,
            'kind': kinds,
            'byte_len': pa.array(out['byte_len'], pa.int64()),
            'width': pa.array(out['width'], pa.int32()),
            'height': pa.array(out['height'], pa.int32()),
            'channels': pa.array(out['channels'], pa.int32()),
            'mean_value': pa.array(out['mean_value'], pa.float64()),
            'decode_ok': pa.array(out['decode_ok'], pa.bool_()),
        })


def decode_media_features(sf_dir, batch_size=64, fake=None):
    """synthesize → actor-pool decode; returns FEATURES_SCHEMA dataset.
    ``fake=None`` follows the GRAFT_MM_REAL_CODECS env knob."""
    if fake is None:
        fake = not real_codecs_requested()
    return synthesize_media(sf_dir).map_batches(
        DecodeMedia, fn_constructor_kwargs={'fake': fake},
        batch_format='pyarrow', batch_size=batch_size,
        concurrency=pool(), zero_copy_batch=True)


class ResizeMedia:
    """Actor-pool resize stage: decode → nearest-neighbor resample →
    re-encode.  ``fake=False`` is the real-codec path (Pillow or the
    pure PNG codec: decode → ``resize(NEAREST)`` → PNG re-encode); the
    fake path does a REAL nearest-neighbor resample on the MMV1 pixel
    buffer so the plumbing (payload in, payload out, metadata update)
    is fully exercised either way."""

    def __init__(self, target_w, target_h, fake=True):
        self.tw = int(target_w)
        self.th = int(target_h)
        self.fake = fake
        self._pil = None if fake else _try_pil()

    def _resize(self, payload):
        if not self.fake:
            try:
                img = self._pil.open(io.BytesIO(payload))
                out = img.resize((self.tw, self.th),
                                 self._pil.Resampling.NEAREST)
                buf = io.BytesIO()
                out.save(buf, format='PNG')
            except Exception:
                return None
            ch = len(out.getbands())
            return buf.getvalue(), ch
        if payload[:4] != _MAGIC or len(payload) < 16:
            return None
        w, h, ch = (int(v) for v in np.frombuffer(payload[4:16], dtype='<u4'))
        body = np.frombuffer(payload[16:16 + w * h * ch], dtype=np.uint8)
        if body.size != w * h * ch:
            return None
        img = body.reshape(h, w, ch)
        yi = (np.arange(self.th) * h // self.th)
        xi = (np.arange(self.tw) * w // self.tw)
        out = img[yi][:, xi]                      # nearest-neighbor
        head = _MAGIC + np.array([self.tw, self.th, ch], dtype='<u4').tobytes()
        return head + out.tobytes(), ch

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads, ws, hs, cs, ok = [], [], [], [], []
        for payload in batch.column('payload').to_pylist():
            r = self._resize(payload)
            if r is None:
                payloads.append(payload)
                ws.append(0)
                hs.append(0)
                cs.append(0)
                ok.append(False)
            else:
                p, ch = r
                payloads.append(p)
                ws.append(self.tw)
                hs.append(self.th)
                cs.append(ch)
                ok.append(True)
        return pa.table({
            'media_id': batch.column('media_id'),
            'kind': batch.column('kind'),
            'payload': pa.array(payloads, pa.large_binary()),
            'meta_width': pa.array(ws, pa.int32()),
            'meta_height': pa.array(hs, pa.int32()),
            'meta_channels': pa.array(cs, pa.int32()),
        })


class FrameSample:
    """Actor-pool frame-sampling stage for 'video' payloads: treats the
    body as H frames of W×ch and emits every ``stride``-th frame as its own
    MMV1 'image' row (flat_map shape: one input row → many output rows).
    Real codecs (ffmpeg) plug in at the ``fake=False`` seam."""

    def __init__(self, stride=4, fake=True):
        self.stride = int(stride)
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                'GRAFT_MM_REAL_CODECS=1 requested real codecs, but frame '
                'sampling needs ffmpeg, which is not installed in this '
                'container; unset the knob (fake MMV1 mode)')
        mid, fidx, frames = [], [], []
        kinds = batch.column('kind').to_pylist()
        for i, payload in enumerate(batch.column('payload').to_pylist()):
            if kinds[i] != 'video' or payload[:4] != _MAGIC:
                continue
            w, h, ch = (int(v) for v in np.frombuffer(payload[4:16], dtype='<u4'))
            body = np.frombuffer(payload[16:16 + w * h * ch], dtype=np.uint8)
            if body.size != w * h * ch:
                continue
            vid = body.reshape(h, w, ch)          # rows as 'frames'
            media_id = batch.column('media_id')[i].as_py()
            for f in range(0, h, self.stride):
                frame = vid[f]
                head = _MAGIC + np.array([w, 1, ch], dtype='<u4').tobytes()
                mid.append(media_id)
                fidx.append(f)
                frames.append(head + frame.tobytes())
        return pa.table({
            'media_id': pa.array(mid, pa.int64()),
            'frame_idx': pa.array(fidx, pa.int32()),
            'frame': pa.array(frames, pa.large_binary()),
        })


def resize_media(sf_dir, target_w=16, target_h=16, batch_size=64, fake=None):
    """synthesize → actor-pool resize; returns MEDIA_SCHEMA dataset.
    ``fake=None`` follows the GRAFT_MM_REAL_CODECS env knob."""
    if fake is None:
        fake = not real_codecs_requested()
    return synthesize_media(sf_dir).map_batches(
        ResizeMedia, fn_constructor_args=(target_w, target_h),
        fn_constructor_kwargs={'fake': fake},
        batch_format='pyarrow', batch_size=batch_size,
        concurrency=pool(), zero_copy_batch=True)


def resized_features(sf_dir, target_w=16, target_h=16, batch_size=64):
    """synthesize → resize → decode: FEATURES_SCHEMA of the RESIZED
    payloads.  This makes the resize math itself oracle-checkable — the
    nearest-neighbor index arithmetic is recomputable in SQL over the
    deterministic payload, so the DuckDB oracle verifies the full
    synthesize→resize→decode chain (the payload blobs in resize_media's
    own output can't be compared in SQL)."""
    return resize_media(sf_dir, target_w, target_h, batch_size).map_batches(
        DecodeMedia, batch_format='pyarrow', batch_size=batch_size,
        concurrency=pool(), zero_copy_batch=True)


class FrameFeatures:
    """Per-frame decode stage over sample_frames output: parses each MMV1
    frame container and emits its byte length and pixel mean — the
    oracle-checkable summary of the frame-sampling math."""

    def __init__(self):
        pa.set_cpu_count(1)
        pa.set_io_thread_count(1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        byte_len, means = [], []
        for frame in batch.column('frame').to_pylist():
            byte_len.append(len(frame))
            w, h, ch = (int(v) for v in np.frombuffer(frame[4:16], dtype='<u4'))
            body = np.frombuffer(frame[16:16 + w * h * ch], dtype=np.uint8)
            means.append(float(round_half_up([body.mean()], 4)[0]))
        return pa.table({
            'media_id': batch.column('media_id'),
            'frame_idx': batch.column('frame_idx'),
            'byte_len': pa.array(byte_len, pa.int64()),
            'mean_value': pa.array(means, pa.float64()),
        })


def frame_features(sf_dir, stride=4, batch_size=64):
    """synthesize → frame-sample → per-frame decode (oracle-checkable)."""
    return sample_frames(sf_dir, stride, batch_size).map_batches(
        FrameFeatures, batch_format='pyarrow', batch_size=batch_size,
        concurrency=pool(), zero_copy_batch=True)


def sample_frames(sf_dir, stride=4, batch_size=64, fake=None):
    """synthesize → actor-pool frame sampling (row-expanding stage).
    ``fake=None`` follows the GRAFT_MM_REAL_CODECS env knob."""
    if fake is None:
        fake = not real_codecs_requested()
    return synthesize_media(sf_dir).map_batches(
        FrameSample, fn_constructor_args=(stride,),
        fn_constructor_kwargs={'fake': fake},
        batch_format='pyarrow', batch_size=batch_size,
        concurrency=pool(), zero_copy_batch=True)


def _md5_hex(blobs):
    import hashlib
    return pa.array([hashlib.md5(b).hexdigest() for b in blobs], pa.string())


def resized_blob_md5(sf_dir, target_w=16, target_h=16, batch_size=64):
    """BLOB-level check of resize_media: md5 of every emitted payload (the
    bytes themselves, not just the stats) — compared against the
    independently recomputed fixture md5s (oracles.mm_blob_oracle_sqls).
    SQL has no BLOB md5, so the digest is emitted as a hex column."""
    def digest(batch: pa.Table) -> pa.Table:
        return pa.table({
            'media_id': batch.column('media_id'),
            'kind': batch.column('kind'),
            'width': batch.column('meta_width'),
            'height': batch.column('meta_height'),
            'channels': batch.column('meta_channels'),
            'payload_md5': _md5_hex(batch.column('payload').to_pylist()),
        })
    return resize_media(sf_dir, target_w, target_h, batch_size).map_batches(
        digest, batch_format='pyarrow', zero_copy_batch=True)


def frame_blob_md5(sf_dir, stride=4, batch_size=64):
    """BLOB-level check of sample_frames: md5 + byte length of every
    emitted frame container."""
    def digest(batch: pa.Table) -> pa.Table:
        blobs = batch.column('frame').to_pylist()
        return pa.table({
            'media_id': batch.column('media_id'),
            'frame_idx': batch.column('frame_idx'),
            'byte_len': pa.array([len(b) for b in blobs], pa.int64()),
            'frame_md5': _md5_hex(blobs),
        })
    return sample_frames(sf_dir, stride, batch_size).map_batches(
        digest, batch_format='pyarrow', zero_copy_batch=True)
