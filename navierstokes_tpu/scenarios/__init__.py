from navierstokes_tpu.scenarios.registry import (  # noqa: F401
    SCENARIOS, Scenario, build_solver, get_scenario)
