from .synthesize import load_params, synthesize_mels
