"""Real external decoders backed by the CPython stdlib (``aifc``/``sunau``
+ the C ``audioop`` module), registrable through the decoder registry.

The registry's contract tests (tests/test_decoder_registry.py) drive FAKE
decoders; this module is the one *real* third-party decoder available in a
bare sandbox, and it exercises return-quirk classes a fake can't:

* **Endianness split.** ``aifc.readframes`` returns the file's raw sample
  bytes for uncompressed AIFF (big-endian, per the AIFF spec) but
  *native-endian* int16 for compressed AIFF-C — because decompression goes
  through ``audioop``'s C routines, which emit machine byte order.  A
  decoder that assumes one convention corrupts the other path.
* **Multi-channel returns.** The engine contract is 1-D mono PCM;
  real containers carry stereo.  Channels are downmixed by mean (and the
  quirk is pinned by a test, not silently assumed).
* **Container-declared rate.** The file header carries its own frame rate;
  like the built-in WAV path, a mismatch against the row's ``sr_hz``
  metadata raises instead of silently shifting shingles.

Availability: ``aifc``/``sunau``/``audioop`` are deprecated in CPython 3.11
and **removed in 3.13** — imports live inside the decode functions (also the
cluster-correct pattern: the import runs on the executor), and
``register_stdlib_audio_decoders`` raises a clear error when the interpreter
no longer ships them.  On such interpreters these formats fall back to the
registry's loud ``NotImplementedError`` stub like any other external codec.

Reference parity: n/a — the Pig reference has no media operators; this is
part of the engine's training-data-pipeline surface (decoder-registry seam,
``decoders.py``).
"""

from __future__ import annotations

import io
import sys
import warnings

import numpy as np


def _norm(samples: np.ndarray, sampwidth: int, nchannels: int) -> np.ndarray:
    """int samples (interleaved) → mono float32 in [-1, 1]."""
    x = samples.astype(np.float32)
    if nchannels > 1:
        x = x[: (len(x) // nchannels) * nchannels]
        x = x.reshape(-1, nchannels).mean(axis=1)
    full = float(2 ** (8 * sampwidth - 1) - 1)
    return np.clip(x / full, -1.0, 1.0).astype(np.float32)


def aiff_decode(blob: bytes, sr_hz: int) -> np.ndarray:
    """Decode AIFF / AIFF-C bytes to mono float32 PCM via stdlib ``aifc``.

    Compressed AIFF-C (``ulaw``/``alaw``/``G722`` comptypes) decompresses
    through CPython's C ``audioop`` — a genuinely external decode path.
    Module-level and import-inside so the registry snapshot cloudpickles to
    executors and the (deprecated) stdlib import happens there.
    """
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        import aifc

    f = aifc.open(io.BytesIO(blob), "rb")
    try:
        rate = int(f.getframerate())
        if rate != int(sr_hz):
            raise ValueError(
                f"aiff: container says {rate} Hz but row metadata says "
                f"{sr_hz} Hz"
            )
        nch = f.getnchannels()
        sw = f.getsampwidth()
        comp = f.getcomptype()
        data = f.readframes(f.getnframes())
    finally:
        f.close()
    if comp == b"NONE":
        # uncompressed AIFF: raw file bytes, big-endian per spec
        if sw == 1:
            samples = np.frombuffer(data, dtype=np.int8)
        elif sw == 2:
            samples = np.frombuffer(data, dtype=">i2")
        elif sw == 4:
            samples = np.frombuffer(data, dtype=">i4")
        else:
            raise ValueError(f"aiff: unsupported sample width {sw}")
        return _norm(samples, sw, nch)
    # compressed AIFF-C: aifc decompresses via audioop, which returns int16
    # in NATIVE byte order (not the file's big-endian) — the quirk this
    # module exists to pin down
    samples = np.frombuffer(data, dtype=np.int16)
    return _norm(samples, 2, nch)


def au_decode(blob: bytes, sr_hz: int) -> np.ndarray:
    """Decode Sun AU (.au/.snd) bytes to mono float32 PCM via stdlib
    ``sunau`` (µ-law decompression through C ``audioop``)."""
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        import sunau

    f = sunau.open(io.BytesIO(blob), "rb")
    try:
        rate = int(f.getframerate())
        if rate != int(sr_hz):
            raise ValueError(
                f"au: container says {rate} Hz but row metadata says "
                f"{sr_hz} Hz"
            )
        nch = f.getnchannels()
        sw = f.getsampwidth()
        comp = f.getcomptype()
        data = f.readframes(f.getnframes())
    finally:
        f.close()
    if comp == "ULAW":
        # sunau reports sampwidth 1 for µ-law but readframes returns
        # audioop-decompressed int16 in native byte order
        return _norm(np.frombuffer(data, dtype=np.int16), 2, nch)
    if sw == 1:
        samples = np.frombuffer(data, dtype=np.int8)
    elif sw == 2:
        samples = np.frombuffer(data, dtype=">i2")  # AU is big-endian
    elif sw == 4:
        samples = np.frombuffer(data, dtype=">i4")
    else:
        raise ValueError(f"au: unsupported sample width {sw}")
    return _norm(samples, sw, nch)


def stdlib_audio_available() -> bool:
    """True when the interpreter still ships aifc/sunau/audioop."""
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        try:
            import aifc  # noqa: F401
            import audioop  # noqa: F401
            import sunau  # noqa: F401
        except ImportError:
            return False
    return True


def register_stdlib_audio_decoders() -> list[str]:
    """Register ``aiff`` and ``au`` in the external-decoder registry.

    Returns the tags registered.  Raises on interpreters (CPython ≥ 3.13)
    where the stdlib modules were removed — the caller then needs a real
    audio library, same as for mp3/opus.
    """
    if not stdlib_audio_available():
        raise RuntimeError(
            "stdlib audio modules (aifc/sunau/audioop) are not available on "
            f"python {sys.version_info.major}.{sys.version_info.minor} "
            "(removed in 3.13); register a third-party decoder instead"
        )
    from datasketches_pig_spark.decoders import register_audio_decoder

    register_audio_decoder("aiff", aiff_decode)
    register_audio_decoder("au", au_decode)
    return ["aiff", "au"]
