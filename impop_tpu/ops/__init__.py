from impop_tpu.ops.pairdiff import pairwise_identity_pallas, pairwise_identity_xla

__all__ = ["pairwise_identity_pallas", "pairwise_identity_xla"]
