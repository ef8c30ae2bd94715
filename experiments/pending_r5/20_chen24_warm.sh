# chen24 Burgers with forward-march warm start + stall detection:
# N60 CPU check cut 9 -> 5 steps at identical err; target <20 s solve
run_job chen24_N1000_warm 2400 python experiments/chen24/burgers_chen24.py \
  --N_x 1000 --el_order 2 --sqrt --stepwise --warm_start
