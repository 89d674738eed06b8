from remfx_tpu.losses.stft_loss import (
    MultiResolutionSTFTLoss,
    STFTLoss,
    multi_resolution_stft_loss,
)
from remfx_tpu.losses.time_loss import l1_loss, si_sdr, sisdr_loss

__all__ = [
    "MultiResolutionSTFTLoss",
    "STFTLoss",
    "multi_resolution_stft_loss",
    "l1_loss",
    "si_sdr",
    "sisdr_loss",
]
