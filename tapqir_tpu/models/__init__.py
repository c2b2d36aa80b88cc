"""Model registry (reference: tapqir/models/__init__.py:17-21)."""

from tapqir_tpu.models.cosmos import cosmos
from tapqir_tpu.models.model import Model

__all__ = ["models", "Model", "cosmos"]

models = {
    cosmos.name: cosmos,
}


def _register_optional():
    """Register models added in later milestones without hard import errors."""
    try:
        from tapqir_tpu.models.crosstalk import crosstalk

        models[crosstalk.name] = crosstalk
    except ImportError:
        pass
    try:
        from tapqir_tpu.models.hmm import hmm

        models[hmm.name] = hmm
    except ImportError:
        pass


_register_optional()
