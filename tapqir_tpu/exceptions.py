"""Exception hierarchy (reference: tapqir/exceptions.py:8-39)."""


class TapqirException(Exception):
    """Base class for tapqir-tpu exceptions."""


class TapqirFileNotFoundError(TapqirException):
    """A required file is missing (reference: tapqir/exceptions.py:15-31)."""

    def __init__(self, name, path):
        self.name = name
        self.path = path
        super().__init__(
            f"Cannot find {name} file at {path}. "
            f"Did you run the required previous steps?"
        )


class TpuOutOfMemoryError(TapqirException):
    """Device ran out of memory (reference: CudaOutOfMemoryError,
    tapqir/exceptions.py:33-39). Advice is the same: reduce --fbatch-size
    (e.g. 128 or 256) or --nbatch-size (e.g. 5)."""

    def __init__(self):
        super().__init__(
            "Device ran out of memory. Try smaller --fbatch-size "
            "(e.g., 128 or 256) or smaller --nbatch-size (e.g., 5)."
        )
