"""Optional native (C) hot loop for FSST encode/decode.

Pure from-scratch C (~80 lines), compiled on first use with the system
gcc into a cached shared object; everything degrades gracefully to the
numpy path when no compiler is present. The encoded stream is the same
(code | 0xFF-escape) format — the C path does exact greedy longest-match
per position, so parses may differ from the numpy block-parallel parse,
but every parse decodes to identical bytes (the bit-identical guarantee
applies to decoded data, and each environment is internally
deterministic, so Ray task retries reproduce identical chunks).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

_C_SRC = r"""
#include <stdint.h>
#include <string.h>

#define ESCAPE 255

/* Two-level candidate lookup (the standard FSST trick): symbols of
   length >= 2 chain off a 64K first-TWO-byte prefix table, so the per-
   position scan touches only codes that already match two bytes (usually
   0-2 candidates) instead of every code sharing one first byte; 1-byte
   symbols sit in a direct 256-entry code table consulted only when no
   longer symbol matched. Chains preserve the caller's length-desc code
   order (greedy longest-match is unchanged — output streams are byte-
   identical to the single-byte-bucket loop this replaces). */

long long fsst_encode(const uint8_t* in, long long n, uint8_t* out,
                      const uint8_t* sym_bytes, const uint8_t* sym_lens,
                      int n_sym) {
    static _Thread_local int16_t head[65536];
    int16_t nxt[256];
    int16_t short_code[256];
    int offs[256];
    memset(head, 0xFF, sizeof(head));        /* all -1 */
    memset(short_code, 0xFF, sizeof(short_code));
    int off = 0;
    for (int c = 0; c < n_sym; c++) {
        offs[c] = off;
        off += sym_lens[c];
    }
    /* reverse iteration + prepend = chains in original (length-desc)
       order, so the first chain hit is the longest match */
    for (int c = n_sym - 1; c >= 0; c--) {
        if (sym_lens[c] >= 2) {
            int pfx = (sym_bytes[offs[c]] << 8) | sym_bytes[offs[c] + 1];
            nxt[c] = head[pfx];
            head[pfx] = (int16_t)c;
        } else {
            short_code[sym_bytes[offs[c]]] = (int16_t)c;
        }
    }
    long long i = 0, o = 0;
    while (i < n) {
        if (i + 1 < n) {
            int pfx = (in[i] << 8) | in[i + 1];
            int emitted = 0;
            for (int c = head[pfx]; c >= 0; c = nxt[c]) {
                int L = sym_lens[c];
                if (i + L <= n &&
                    memcmp(in + i + 2, sym_bytes + offs[c] + 2, L - 2) == 0) {
                    out[o++] = (uint8_t)c;
                    i += L;
                    emitted = 1;
                    break;
                }
            }
            if (emitted) continue;
        }
        int sc = short_code[in[i]];
        if (sc >= 0) {
            out[o++] = (uint8_t)sc;
            i++;
        } else {
            out[o++] = ESCAPE;
            out[o++] = in[i++];
        }
    }
    return o;
}

/* out_cap bounds every write: a corrupted payload must return -1, not
   scribble past the caller's buffer */
long long fsst_decode(const uint8_t* in, long long n, uint8_t* out,
                      long long out_cap,
                      const uint8_t* sym_bytes, const uint8_t* sym_lens,
                      int n_sym) {
    int offs[256];
    int off = 0;
    for (int c = 0; c < n_sym; c++) { offs[c] = off; off += sym_lens[c]; }
    long long i = 0, o = 0;
    while (i < n) {
        uint8_t c = in[i++];
        if (c == ESCAPE) {
            if (i >= n || o >= out_cap) return -1;
            out[o++] = in[i++];
        } else {
            if (c >= n_sym) return -1;
            int L = sym_lens[c];
            if (o + L > out_cap) return -1;
            memcpy(out + o, sym_bytes + offs[c], L);
            o += L;
        }
    }
    return o;
}
"""

_lib = None
_tried = False


def _cache_dir() -> str:
    """Per-user, mode-0700 cache dir — never the shared world-writable
    temp dir, where another local user could pre-plant a malicious .so
    at the predictable path before we CDLL-load it."""
    base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache")
    candidates = [
        os.path.join(base, "jtpr_fsst"),
        # stable per-uid fallback so the compile cache still works (and
        # doesn't leak one mkdtemp dir per process) when $HOME is unsafe
        os.path.join(tempfile.gettempdir(), f"jtpr_fsst_{os.getuid()}"),
    ]
    for d in candidates:
        try:
            os.makedirs(d, mode=0o700, exist_ok=True)
            st = os.stat(d)
            if st.st_uid == os.getuid() and not (st.st_mode & 0o022):
                return d
        except OSError:
            continue
    return tempfile.mkdtemp(prefix="jtpr_fsst_")  # last resort, private


def _build() -> ctypes.CDLL | None:
    try:
        # source-hash in the name: a changed C source auto-invalidates
        # the compiled cache
        tag = hashlib.sha1(_C_SRC.encode()).hexdigest()[:10]
        cache = os.path.join(_cache_dir(), f"jtpr_fsst_native_{tag}.so")
    except OSError:
        return None
    if os.path.exists(cache) and os.stat(cache).st_uid != os.getuid():
        return None
    if not os.path.exists(cache):
        with tempfile.NamedTemporaryFile("w", suffix=".c", delete=False) as f:
            f.write(_C_SRC)
            src = f.name
        tmp_so = cache + f".build.{os.getpid()}"
        try:
            subprocess.run(
                ["gcc", "-O2", "-shared", "-fPIC", "-o", tmp_so, src],
                check=True, capture_output=True, timeout=60,
            )
            os.replace(tmp_so, cache)
        except (subprocess.SubprocessError, FileNotFoundError, OSError):
            return None
        finally:
            os.unlink(src)
            # a failed/timed-out compile leaves a partial .so.build.<pid>
            # behind — repeated failures on a cluster would accumulate
            try:
                os.unlink(tmp_so)
            except OSError:
                pass
    try:
        lib = ctypes.CDLL(cache)
    except OSError:
        return None
    lib.fsst_encode.restype = ctypes.c_longlong
    lib.fsst_encode.argtypes = [
        ctypes.c_char_p, ctypes.c_longlong, ctypes.c_char_p,
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int]
    lib.fsst_decode.restype = ctypes.c_longlong
    lib.fsst_decode.argtypes = [
        ctypes.c_char_p, ctypes.c_longlong, ctypes.c_char_p,
        ctypes.c_longlong, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int]
    return lib


def get_lib():
    global _lib, _tried
    if not _tried:
        _tried = True
        _lib = _build()
    return _lib


def native_encode(data: bytes, symbols: list[bytes]) -> bytes | None:
    """Symbols MUST already be in length-desc code order (train() emits
    that canonical order), so bucket scan order = longest-first."""
    lib = get_lib()
    if lib is None or len(symbols) > 255:
        return None
    lens = bytes(len(s) for s in symbols)
    blob = b"".join(symbols)
    out = ctypes.create_string_buffer(2 * len(data) + 16)
    n = lib.fsst_encode(data, len(data), out, blob, lens, len(symbols))
    return out.raw[:n]


def native_decode(enc: bytes, symbols: list[bytes], out_size: int) -> bytes | None:
    lib = get_lib()
    if lib is None or len(symbols) > 255:
        return None
    lens = bytes(len(s) for s in symbols)
    blob = b"".join(symbols)
    cap = max(out_size, 1)
    out = ctypes.create_string_buffer(cap)
    n = lib.fsst_decode(enc, len(enc), out, cap, blob, lens, len(symbols))
    if n < 0:
        raise ValueError(
            "corrupt FSST stream: decoded size exceeds recorded size, "
            "truncated escape, or out-of-range code")
    return out.raw[:n]
