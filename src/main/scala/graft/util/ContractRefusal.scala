package graft.util

/** Thrown when an operator REFUSES work its scale contract marks
  * infeasible — the loud, actionable alternative to dying mid-shuffle
  * (the 30× full-corpus run killed the exact all-pairs baseline with
  * ENOSPC after >79 GB of sort spill; a refusal with the scale path
  * named costs one control-plane aggregate instead). `graft.Bench`
  * records these rows under `"refused"` — distinct from `"errors"`,
  * because the refusal IS the operator's documented behavior.
  */
class ContractRefusal(msg: String) extends IllegalStateException(msg)
