from cmacionize_tpu.models import ions  # noqa: F401
