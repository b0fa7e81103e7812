"""Transform plans: flat layout, flatten/unflatten/xflatten column plans,
schema-resolution (evolution) planning, and the compiled-plan cache."""
