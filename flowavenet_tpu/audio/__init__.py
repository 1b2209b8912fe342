from .mel import (hann_window, hz_to_mel, mel_filterbank, mel_spectrogram,
                  mel_spectrogram_jax, mel_to_hz, normalize_mel, process_wav,
                  stft_power)
from .wavio import load_audio, read_wav, resample, write_wav
from .tacotron import adapt_gta_mel
