from pylda_tpu.utils.config import LDAConfig

__all__ = ["LDAConfig"]
