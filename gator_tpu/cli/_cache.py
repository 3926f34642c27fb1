"""Persistent-compile-cache setup — a leaf module so the lightweight
CLIs (demo/serve) can enable it without importing the training stack."""
from __future__ import annotations

import hashlib
import os
import platform
from typing import Optional

import jax


def default_cache_dir() -> Optional[str]:
    """Machine-keyed persistent cache location. XLA:CPU persists AOT
    MACHINE CODE: executing a cached entry compiled on a different host
    (or by a different XLA) can abort the whole process — cpu_aot_loader
    only logs a "could lead to execution errors such as SIGILL" warning
    and proceeds. This sandbox demonstrably moves between host machines
    across sessions, so the directory is keyed by (arch, cpuinfo flags,
    jax version): a cache written elsewhere becomes invisible instead of
    fatal. Returns None (caller disables the cache) when the machine
    cannot be fingerprinted — a shared fallback dir would reinstate the
    cross-host SIGILL hazard the keying exists to prevent."""
    try:
        # fingerprint = every stable identity line of cpu 0's cpuinfo
        # block. Flags alone proved insufficient: two distinct hosts can
        # share an identical flags line (same CPU family) while their
        # LLVM-detected feature sets differ, and /tmp persists across
        # this sandbox's host moves — model name/stepping/microcode
        # disambiguate. Volatile lines (cpu MHz, bogomips) are excluded
        # so the key survives reboots on the SAME host.
        ident: list = []
        with open("/proc/cpuinfo") as f:
            for line in f:
                if not line.strip():
                    break          # end of cpu 0's block
                if line.startswith(("model name", "model", "stepping",
                                    "microcode", "cpu family", "vendor_id",
                                    "flags", "Features", "CPU part",
                                    "CPU variant", "CPU revision")):
                    ident.append(line.strip())
        key = f"{platform.machine()}:{';'.join(ident)}:{jax.__version__}"
        tag = hashlib.md5(key.encode()).hexdigest()[:10]
    except Exception:   # noqa: BLE001 — cache is an optimization only
        return None
    return f"/tmp/jax_cache_{tag}"


def enable_compile_cache():
    """Persistent XLA compilation cache for every CLI run (same policy as
    bench.py): repeat invocations skip recompiles — on hosts that reach
    the TPU through a relay those cost minutes each. Idempotent;
    JAX_CACHE_DIR overrides the location."""
    try:
        cache_dir = os.environ.get("JAX_CACHE_DIR", default_cache_dir())
        if not cache_dir:
            return   # unfingerprintable host: run uncached (see above)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:   # noqa: BLE001 — cache is an optimization only
        pass
