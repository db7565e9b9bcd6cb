"""Post-trace analysis: flux maps, statistical estimators, radiosity."""
