from .server import SynthesisService, make_handler, serve
