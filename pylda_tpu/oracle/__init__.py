from pylda_tpu.oracle.vb import OracleVB
from pylda_tpu.oracle.gibbs import OracleGibbs

__all__ = ["OracleVB", "OracleGibbs"]
