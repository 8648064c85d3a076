"""Non-RL baseline controllers (reference: myosuite/agents/baseline_*)."""
