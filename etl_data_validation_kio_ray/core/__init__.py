from .specs import RuleSpec, default_rules, load_rules
from .verdicts import CheckResult, gate_status

__all__ = ["RuleSpec", "default_rules", "load_rules", "CheckResult", "gate_status"]
