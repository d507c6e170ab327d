from layoutdetr_tpu.models import layers  # noqa: F401
