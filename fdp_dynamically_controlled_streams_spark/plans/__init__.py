"""Plan inspection & audit — the engine's scale-readiness tooling."""

from fdp_dynamically_controlled_streams_spark.plans.audit import (  # noqa: F401
    PlanAudit,
    audit_plan,
    explain_str,
)
