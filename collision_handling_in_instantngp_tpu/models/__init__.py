from . import encoding, gngf, hpd, mlp  # noqa: F401
