"""``python -m tapqir_tpu`` runs the CLI."""

from tapqir_tpu.main import app

if __name__ == "__main__":
    app()
