"""Signal-chain models: end-to-end modem and channelizer waveforms built
from the primitive layers — the framework's "model zoo" equivalents of the
reference's examples (modem loopback, waterfall)."""

from . import modem
from . import channelizer
from .modem import (
    Modem,
    ModemConfig,
    RxChain,
    RxChainConfig,
    TxChain,
    loopback_delay,
    pad_to_frames,
)
from .channelizer import (
    Channelizer,
    welch_psd,
    PfbChannelizer,
    PfbSynthesizer,
    pfb_channelize,
    pfb_prototype,
    pfb_synthesis_taps,
    pfb_synthesize,
    pfb_channelize_os,
    pfb_prototype_nyquist,
    pfb_synthesize_os,
    PfbChannelizerOs,
    PfbSynthesizerOs,
    sharded_pfb_os,
    stft,
    istft,
)
from . import sync
from . import caf
from . import packet
from . import css
from . import channel
from . import detect
from . import amc
from . import diversity
from . import doa
from . import ber
from . import ddc
from . import equalizer
from . import ofdm
from . import fsk
from . import fhss
from .sync import OfdmEqualizer, detect_preamble
from .ddc import Ddc, DdcConfig, Duc, DucConfig, ddc_bank, sharded_ddc, sharded_duc
from .ofdm import OfdmConfig, OfdmModem, cp_sync
from .fsk import FskConfig, FskModem
from .packet import PacketConfig, PacketModem
from .css import CssConfig, CssModem
from .channel import Channel, ChannelConfig
from . import detect

__all__ = [
    "modem",
    "channelizer",
    "Modem",
    "ModemConfig",
    "RxChain",
    "RxChainConfig",
    "TxChain",
    "loopback_delay",
    "Channelizer",
    "PfbChannelizer",
    "PfbSynthesizer",
    "welch_psd",
    "pfb_channelize",
    "pfb_prototype",
    "pfb_synthesis_taps",
    "pfb_synthesize",
    "pfb_channelize_os",
    "pfb_prototype_nyquist",
    "pfb_synthesize_os",
    "PfbChannelizerOs",
    "PfbSynthesizerOs",
    "sharded_pfb_os",
    "stft",
    "istft",
    "sync",
    "amc",
    "diversity",
    "ber",
    "ddc",
    "equalizer",
    "ofdm",
    "fhss",
    "OfdmConfig",
    "OfdmModem",
    "cp_sync",
    "fsk",
    "FskConfig",
    "FskModem",
    "Ddc",
    "DdcConfig",
    "Duc",
    "DucConfig",
    "ddc_bank",
    "sharded_ddc",
    "sharded_duc",
    "OfdmEqualizer",
    "detect_preamble",
]
