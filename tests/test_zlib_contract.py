"""Golden-byte contract for tx27's one external dependency (round-7
verdict task #7).

tx27_compression_quality is the repo's single declared rows-only query:
its zlib scorer has no SQL twin, so the oracle harness can only bounds-
check it (tools/strict_sweep.py::_bounds_tx27 pins the zlib envelope and
the flag derivation in DuckDB) while tests/test_llm_ops.py replays the
exact ratios against direct python zlib. What NEITHER of those pins is
the external library itself: zlib output at a fixed level is stable
across upstream zlib releases in practice but NOT guaranteed by the
format, and drop-in replacements (zlib-ng, cloudflare-zlib) produce
different — still valid — byte streams, which would silently change
every tx27 score between environments. These golden bytes (captured
from zlib 1.2.13, the container's build) fail loudly if the runtime
codec changes, turning "honestly external" into "externally pinned".
"""

from __future__ import annotations

import zlib

# (raw payload, zlib.compress(payload, 6).hex()) — covers the empty
# string, plain ASCII, a highly repetitive string (the low-ratio tail
# tx27 flags), incompressible binary (the high-ratio tail), and
# multi-byte UTF-8 (tx27 encodes text as UTF-8 before compressing).
GOLDEN = [
    (b"", "789c030000000001"),
    (b"hello world", "789ccb48cdc9c95728cf2fca4901001a0b045d"),
    (b"ab" * 100, "789c4b4c4a1c161000e98f4c2d"),
    (
        bytes(range(256)),
        "789c010001fffe000102030405060708090a0b0c0d0e0f10111213141516171819"
        "1a1b1c1d1e1f202122232425262728292a2b2c2d2e2f30313233343536373839"
        "3a3b3c3d3e3f404142434445464748494a4b4c4d4e4f50515253545556575859"
        "5a5b5c5d5e5f606162636465666768696a6b6c6d6e6f70717273747576777879"
        "7a7b7c7d7e7f808182838485868788898a8b8c8d8e8f90919293949596979899"
        "9a9b9c9d9e9fa0a1a2a3a4a5a6a7a8a9aaabacadaeafb0b1b2b3b4b5b6b7b8b9"
        "babbbcbdbebfc0c1c2c3c4c5c6c7c8c9cacbcccdcecfd0d1d2d3d4d5d6d7d8d9"
        "dadbdcdddedfe0e1e2e3e4e5e6e7e8e9eaebecedeeeff0f1f2f3f4f5f6f7f8f9"
        "fafbfcfdfeffadf67f81",
    ),
    (
        "mixed é中文 text".encode("utf-8"),
        "789ccbcdac484d5138bcf2c98eb5cfa6b52b94a45694000061cb09d5",
    ),
]


def test_zlib_level6_golden_bytes():
    for raw, want_hex in GOLDEN:
        got = zlib.compress(raw, 6).hex()
        assert got == want_hex, (
            f"zlib level-6 output changed for {raw[:20]!r}: the runtime "
            f"codec is not the pinned build ({zlib.ZLIB_RUNTIME_VERSION}) "
            "— tx27 scores are no longer comparable with recorded rounds"
        )


def test_zlib_roundtrip_and_ratio_shape():
    # the two tails tx27 flags: repetitive text compresses far below the
    # 0.25 floor; incompressible bytes land above the 0.95 ceiling
    rep = b"ab" * 100
    assert zlib.decompress(zlib.compress(rep, 6)) == rep
    assert len(zlib.compress(rep, 6)) / len(rep) < 0.25
    blob = bytes(range(256))  # one pass of all byte values: no repetition
    assert len(zlib.compress(blob, 6)) / len(blob) > 0.95
