# Distributed WALS task definition (protobuf TextFormat, field-compatible
# with reference distributed/proto/task.proto + examples/task.pb).
nepochs : 5
nfactors : 30
distribution_file : "./uniform.dat"
train_set : "./ratings.txt"
user_factors : "./user_factors_vec.dat"
item_factors : "./item_factors_vec.dat"
