"""Device-fault classification for chunk-level retry.

The tunneled runtime intermittently fails *re-executions* of specific
compiled programs (first exec OK, later execs INVALID_ARGUMENT
"Execution supplied N buffers ..."). JAX dispatch is asynchronous, so
such a fault does not raise at the dispatch call — it surfaces at the
next *blocking* point: an ``np.asarray`` download, a
``block_until_ready``, or an eager op (``jnp.concatenate``) consuming
the poisoned handle. That means every blocking device read is a
potential raise site, and try/except around the dispatch loop alone is
a hole (the round-4 official bench died exactly this way).

Callers use :func:`is_device_fault` to distinguish runtime/transport
faults (retry the affected chunk through a host fallback — the
reference's serial loop never dies mid-batch, cli/main.py:142-144)
from ordinary code bugs (propagate).
"""

from __future__ import annotations

_FAULT_TYPE_NAMES = ("JaxRuntimeError", "XlaRuntimeError")


def is_axon_backend() -> bool:
    """True when the default JAX backend is the tunneled 'axon' runtime.

    ``jax.default_backend()`` is USELESS for this: the axon PJRT plugin
    reports ``platform == "tpu"`` (verified on the tunnel: default_backend()
    -> 'tpu', platform_version -> 'PJRT C API\\naxon 0.1.0; ...'). The
    round-4/5 wiz-refine gate compared against the registration name
    'axon' and therefore NEVER fired — the session-wedging fused program
    kept dispatching on the tunnel. Fingerprint the plugin via
    platform_version instead."""
    import jax

    try:
        from jax._src import xla_bridge

        ver = getattr(xla_bridge.get_backend(), "platform_version", "")
    except Exception:
        ver = ""
    return "axon" in ver.lower() or jax.default_backend() == "axon"


def is_device_fault(exc: BaseException) -> bool:
    """True when ``exc`` (or anything in its cause/context chain) looks
    like a JAX/XLA runtime failure rather than a Python-level bug."""
    seen = set()
    e: BaseException | None = exc
    while e is not None and id(e) not in seen:
        seen.add(id(e))
        if type(e).__name__ in _FAULT_TYPE_NAMES:
            return True
        mod = type(e).__module__ or ""
        if isinstance(e, RuntimeError) and ("jax" in mod or "xla" in mod):
            return True
        e = e.__cause__ if e.__cause__ is not None else e.__context__
    return False
