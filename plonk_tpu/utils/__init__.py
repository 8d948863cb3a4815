from . import errors, runtime

__all__ = ["errors", "runtime"]
