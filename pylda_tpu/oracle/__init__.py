from pylda_tpu.oracle.vb import OracleVB
from pylda_tpu.oracle.gibbs import OracleGibbs
from pylda_tpu.oracle.hybrid import OracleHybrid
from pylda_tpu.oracle.svi import OracleSVI

__all__ = ["OracleVB", "OracleGibbs", "OracleHybrid", "OracleSVI"]
