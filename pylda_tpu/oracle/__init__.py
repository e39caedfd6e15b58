from pylda_tpu.oracle.vb import OracleVB
from pylda_tpu.oracle.gibbs import OracleGibbs
from pylda_tpu.oracle.hybrid import OracleHybrid

__all__ = ["OracleVB", "OracleGibbs", "OracleHybrid"]
