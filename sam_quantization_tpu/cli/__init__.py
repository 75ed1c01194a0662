"""CLI entry points (counterparts of the reference's script/ drivers).

Shared flag: every CLI takes ``--platform {cpu,tpu}`` to pin the jax
backend in-process. Environment variables are too late here — the
container pre-imports jax on the remote-TPU backend via sitecustomize, so
``JAX_PLATFORMS=cpu`` is silently ignored; correctness drives that must
not touch the chip (e.g. while a benchmark owns it) need the in-process
``jax.config.update``.
"""

from __future__ import annotations


def add_platform_arg(parser) -> None:
    parser.add_argument(
        "--platform", default=None, choices=["cpu", "tpu"],
        help="pin the jax backend in-process (env vars are ignored: jax "
        "is pre-imported on the remote-TPU backend); use --platform cpu "
        "for correctness drives that must not touch the chip",
    )


def apply_platform(args) -> None:
    platform = getattr(args, "platform", None)
    if platform:
        import jax

        if platform == "tpu":
            # Do NOT force the platform name: remote-TPU plugins register
            # under their own name (e.g. 'axon') while still reporting
            # default_backend()=='tpu', and pinning jax_platforms='tpu'
            # there fails at first use with "No jellyfish device found".
            # The default_backend() probe also initializes and caches the
            # backend set, which would make a later config update a silent
            # no-op — so when no TPU-class backend exists, fail LOUDLY
            # here instead of silently benchmarking on CPU.
            if jax.default_backend() != "tpu":
                raise RuntimeError(
                    "--platform tpu: no TPU-class backend available "
                    f"(default backend is {jax.default_backend()!r})"
                )
            return
        jax.config.update("jax_platforms", platform)


def add_scoped_vmem_arg(parser) -> None:
    parser.add_argument(
        "--scoped-vmem-kib", type=int, default=None,
        help="raise XLA's scoped-vmem limit for this run's jits (KiB; "
        "e.g. 24576). 'auto' behavior: serving entry points default to "
        "24576 for 1024-wide (ViT-L) models, where the tight Lp=224 "
        "flash padding needs headroom for XLA's output-in-vmem choice "
        "(ops/flash_attention.scoped_vmem_compiler_options)",
    )


def apply_scoped_vmem(args, embed_dim: int | None = None) -> None:
    """Set SAMQ_SCOPED_VMEM_KIB from the flag (or the ViT-L auto default)
    BEFORE any jit is traced; pair jits with
    ``flash_attention.scoped_vmem_compiler_options()``."""
    import os

    kib = getattr(args, "scoped_vmem_kib", None)
    if kib is None and embed_dim == 1024:
        kib = 24576
    if kib:
        os.environ["SAMQ_SCOPED_VMEM_KIB"] = str(kib)
