// empty stub (cross-check harness): the reference core math never uses this API
#pragma once
