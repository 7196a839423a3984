from .gkr_spec import prove_spec  # noqa: F401
